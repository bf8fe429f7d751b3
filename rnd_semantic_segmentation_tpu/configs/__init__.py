from .node import CfgNode, ConfigError
from .defaults import get_default_cfg

# Singleton default config, mirroring `from core.configs import cfg`
# (/root/reference/core/configs/__init__.py:1). Entry points clone it so test
# isolation is preserved.
cfg = get_default_cfg()

__all__ = ["CfgNode", "ConfigError", "cfg", "get_default_cfg"]
