from .fid import (FeatureExtractor, InceptionFeatureExtractor, compute_fid,
                  default_extractor, frechet_distance)

__all__ = ["compute_fid", "frechet_distance", "FeatureExtractor",
           "InceptionFeatureExtractor", "default_extractor"]
