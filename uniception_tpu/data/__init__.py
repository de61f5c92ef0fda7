from uniception_tpu.data.bucketing import (
    DUST3R_224_BUCKETS,
    DUST3R_512_BUCKETS,
    BucketedBatcher,
    PairBucketedBatcher,
    assign_bucket,
    extract_view,
    extract_views,
    pack_views,
    resize_to_bucket,
)
from uniception_tpu.data.pipeline import epoch_batches, normalize_batch, prefetch_to_device
