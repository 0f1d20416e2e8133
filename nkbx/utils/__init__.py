from nkbx.utils.config import load_config, read_py_config
from nkbx.utils.classes import (
    save_classes,
    load_classes,
    get_classes_configs,
)
from nkbx.utils.misc import (
    sort_df_columns_titled,
    convert_dict_types_recursive,
    export_formats,
)

__all__ = [
    "load_config",
    "read_py_config",
    "save_classes",
    "load_classes",
    "get_classes_configs",
    "sort_df_columns_titled",
    "convert_dict_types_recursive",
    "export_formats",
]
