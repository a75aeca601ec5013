from .fid import compute_fid, frechet_distance, FeatureExtractor

__all__ = ["compute_fid", "frechet_distance", "FeatureExtractor"]
