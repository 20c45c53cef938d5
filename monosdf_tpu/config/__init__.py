from .hocon import parse_hocon, parse_hocon_file, merge_configs
from .schema import build_configs, ExperimentConfig
