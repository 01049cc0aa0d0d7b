from dr4sr_tpu.train.trainer import Trainer  # noqa: F401
