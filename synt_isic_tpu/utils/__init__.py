from .config import ConfigManager, default_config
from .logging import Logger
from .paths import PathManager

__all__ = ["ConfigManager", "default_config", "Logger", "PathManager"]
