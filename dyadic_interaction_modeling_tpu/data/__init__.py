from .loader import PaddedBatchLoader, pad_collate, bucket_length
from .datasets import (
    ViCoDataset,
    ViCoListenerDataset,
    ViCoSpeakerDataset,
    CandorDataset,
    CandorListenerDataset,
    CandorSpeakerDataset,
    LmListenerDataset,
    BiwiDataset,
    BiwiEmocaDataset,
)
from .synthetic import (
    synthetic_vico_clip,
    synthetic_vico_dataset,
    synthetic_candor_dataset,
    synthetic_biwi_dataset,
)

__all__ = [
    "PaddedBatchLoader",
    "pad_collate",
    "bucket_length",
    "ViCoDataset",
    "ViCoListenerDataset",
    "ViCoSpeakerDataset",
    "CandorDataset",
    "CandorListenerDataset",
    "CandorSpeakerDataset",
    "LmListenerDataset",
    "BiwiDataset",
    "BiwiEmocaDataset",
    "synthetic_vico_clip",
    "synthetic_vico_dataset",
    "synthetic_candor_dataset",
    "synthetic_biwi_dataset",
]
