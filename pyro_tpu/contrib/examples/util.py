"""Ref ``pyro/contrib/examples/util.py``: download helpers, gated."""

import os


def get_data_directory(filepath=None):
    """Ref ``util.py:get_data_directory``: per-example data dir."""
    d = os.environ.get(
        "DATA_DIR",
        os.path.join(os.path.expanduser("~"), ".data"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def get_data_loader(dataset_name, data_dir, **kwargs):
    raise RuntimeError(
        f"Downloading {dataset_name} requires network access, which is "
        "unavailable in this environment. Place the dataset under "
        f"{data_dir!r} manually, or use the synthetic generators."
    )
