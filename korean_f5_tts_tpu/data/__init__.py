from korean_f5_tts_tpu.data.dataset import (
    CustomDataset,
    DynamicBatchSampler,
    collate_batch,
    load_dataset,
)

__all__ = ["CustomDataset", "DynamicBatchSampler", "collate_batch", "load_dataset"]
