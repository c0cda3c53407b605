"""Cross-cutting utilities: config, environment, tracking."""

from .config import Config, load_config, make_run_dir, parse_metric  # noqa: F401
from .env import log_environment, set_seeds, setup_logger  # noqa: F401
