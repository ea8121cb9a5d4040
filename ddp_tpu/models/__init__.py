from ddp_tpu.models import base, pendulum

__all__ = ["base", "pendulum"]
