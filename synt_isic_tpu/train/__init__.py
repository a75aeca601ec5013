from .train_ddpm import TrainConfig, TrainState, create_train_state, train_step, train_class
from .data import SingleClassDataset, MultiClassDataset, enhance_color, augment_image
from .distill import DistillConfig, distill_phase, progressive_distill
from .train_conditional import (LabeledMixtureDataset, train_conditional,
                                write_conditional_metadata)

__all__ = ["TrainConfig", "TrainState", "create_train_state", "train_step",
           "train_class", "SingleClassDataset", "MultiClassDataset",
           "enhance_color", "augment_image",
           "DistillConfig", "distill_phase", "progressive_distill",
           "LabeledMixtureDataset", "train_conditional",
           "write_conditional_metadata"]
