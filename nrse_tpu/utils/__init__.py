from nrse_tpu.utils.logging_utils import logger, setup_logger, get_log_level
from nrse_tpu.utils.setup_utils import set_seed
from nrse_tpu.utils.debugging_utils import check_audio_tensor

__all__ = [
    "logger",
    "setup_logger",
    "get_log_level",
    "set_seed",
    "check_audio_tensor",
]
