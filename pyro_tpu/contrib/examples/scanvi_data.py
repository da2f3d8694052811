"""scanvi_data dataset loader (ref ``pyro/contrib/examples/scanvi_data.py``) —
download gated (zero-egress environment)."""


def load_data(*args, **kwargs):
    raise RuntimeError(
        "contrib.examples.scanvi_data requires network downloads, which are "
        "unavailable in this environment; place files under $DATA_DIR."
    )
