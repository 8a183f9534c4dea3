from .config import load_config, merge_args, dump_config  # noqa: F401
