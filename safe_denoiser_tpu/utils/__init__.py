from .config import read_json, load_yaml, save_combined_config
from .logging import Logger

__all__ = ["read_json", "load_yaml", "save_combined_config", "Logger"]
