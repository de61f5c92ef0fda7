from uniception_tpu.data.pipeline import epoch_batches, normalize_batch, prefetch_to_device
