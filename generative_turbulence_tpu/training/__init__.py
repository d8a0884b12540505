from .config import Config, load_config, parse_cli_overrides  # noqa: F401
from .diffusion_task import DiffusionTask  # noqa: F401
from .regression_task import DilResNetTask, TFNetTask  # noqa: F401
from .loop import Trainer  # noqa: F401
