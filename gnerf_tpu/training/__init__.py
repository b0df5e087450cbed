"""L5 training system: datasets, losses, train loop."""

from .augment import AugmentPipe
from .dataset import (
    Afhqv2Dataset,
    Afhqv2TestDataset,
    FFHQGenDataset,
    ShapeNetDataset,
    ShapeNetTestDataset,
    SyntheticDataset,
    TestDataset,
    collate,
    data_iterator,
)
from .losses import (
    VGG16LPIPS,
    d_logistic_loss,
    g_nonsaturating_loss,
    lpips_distance,
    masked_mean,
    r1_penalty,
    ssim,
)
from .train_loop import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_chained_step,
    make_optimizers,
    make_train_step,
    save_snapshot,
)

__all__ = [
    "Afhqv2Dataset",
    "Afhqv2TestDataset",
    "AugmentPipe",
    "FFHQGenDataset",
    "ShapeNetDataset",
    "ShapeNetTestDataset",
    "collate",
    "SyntheticDataset",
    "TestDataset",
    "TrainConfig",
    "TrainState",
    "VGG16LPIPS",
    "d_logistic_loss",
    "data_iterator",
    "g_nonsaturating_loss",
    "init_train_state",
    "lpips_distance",
    "make_chained_step",
    "make_optimizers",
    "make_train_step",
    "masked_mean",
    "r1_penalty",
    "save_snapshot",
    "ssim",
]
