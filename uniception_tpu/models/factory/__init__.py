from uniception_tpu.models.factory.dust3r import DUSt3R
