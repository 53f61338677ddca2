from .smoothing import smooth_logits_matrix, export_emoca_dirs, merge_biwi_to_emoca

__all__ = ["smooth_logits_matrix", "export_emoca_dirs", "merge_biwi_to_emoca"]
