from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.models.factory.flow import UFMFlow
from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
