from .loss import calc_vq_loss, calc_vq_loss_AV, calc_logit_loss, pairwise_distance_loss

__all__ = ["calc_vq_loss", "calc_vq_loss_AV", "calc_logit_loss", "pairwise_distance_loss"]
