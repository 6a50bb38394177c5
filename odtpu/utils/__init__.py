from .config import AttrDict, cfg, default_cfg, load_cfg, merge_cfg_from_file

__all__ = ["AttrDict", "cfg", "default_cfg", "load_cfg", "merge_cfg_from_file"]
