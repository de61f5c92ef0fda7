from uniception_tpu.data.bucketing import extract_view, extract_views, pack_views
from uniception_tpu.data.pipeline import epoch_batches, normalize_batch, prefetch_to_device
