"""nextstrain dataset loader (ref ``pyro/contrib/examples/nextstrain.py``) —
download gated (zero-egress environment)."""


def load_data(*args, **kwargs):
    raise RuntimeError(
        "contrib.examples.nextstrain requires network downloads, which are "
        "unavailable in this environment; place files under $DATA_DIR."
    )
