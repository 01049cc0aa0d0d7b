from dr4sr_tpu.utils.logger import get_logger  # noqa: F401
from dr4sr_tpu.utils.env import seed_everything, setup_environment  # noqa: F401
