from .losses import (MultiBoxLoss, MultiBoxLossOutput, RefineDetLossOutput,
                     focal_loss, mined_multibox, multibox_loss,
                     multibox_targets, refinedet_loss, repulsion_loss,
                     smooth_l1)

__all__ = [
    "MultiBoxLoss", "MultiBoxLossOutput", "RefineDetLossOutput",
    "focal_loss", "mined_multibox", "multibox_loss", "multibox_targets",
    "refinedet_loss", "repulsion_loss", "smooth_l1",
]
