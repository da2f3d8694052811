"""finance dataset loader (ref ``pyro/contrib/examples/finance.py``) —
download gated (zero-egress environment)."""


def load_data(*args, **kwargs):
    raise RuntimeError(
        "contrib.examples.finance requires network downloads, which are "
        "unavailable in this environment; place files under $DATA_DIR."
    )
