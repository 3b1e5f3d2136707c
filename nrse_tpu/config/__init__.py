from nrse_tpu.config.config_utils import load_config, parse_args, get_config, preset_path

__all__ = ["load_config", "parse_args", "get_config", "preset_path"]
