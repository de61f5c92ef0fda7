from uniception_tpu.models import encoders, info_sharing, prediction_heads
from uniception_tpu.models.factory import DUSt3R
from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
