from paddlerec_tpu.core.config import Config, load_config, parse_overrides
from paddlerec_tpu.core.registry import register_model, get_model_class, load_model_def
