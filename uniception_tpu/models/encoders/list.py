"""
CLI: list available encoders (parity with
``python -m uniception.models.encoders.list``, reference encoders/list.py).
"""

from uniception_tpu.models.encoders import ENCODER_CONFIGS


def main():
    print("Available UniCeption-TPU encoders:")
    for name, cfg in sorted(ENCODER_CONFIGS.items()):
        ifr = "yes" if "intermediate_feature_returner_class" in cfg else "no"
        supported = ", ".join(cfg.get("supported_models", []))
        print(f"  {name:24s} IFR: {ifr:3s}  models: {supported}")


if __name__ == "__main__":
    main()
