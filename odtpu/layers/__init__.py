from .losses import (MultiBoxLoss, MultiBoxLossOutput, focal_loss,
                     multibox_loss, multibox_targets, repulsion_loss,
                     smooth_l1)

__all__ = [
    "MultiBoxLoss", "MultiBoxLossOutput", "focal_loss", "multibox_loss",
    "multibox_targets", "repulsion_loss", "smooth_l1",
]
