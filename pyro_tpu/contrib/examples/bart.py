"""BART ridership dataset (ref ``pyro/contrib/examples/bart.py``) —
download gated (zero-egress environment)."""

from .util import get_data_loader  # noqa: F401


def load_bart_od():
    raise RuntimeError(
        "load_bart_od requires downloading BART origin-destination data, "
        "which needs network access. Provide the cached .pkl.bz2 under "
        "$DATA_DIR manually."
    )


def load_fake_od():
    """Tiny synthetic origin-destination counts with the same schema
    (ref ``bart.py:load_fake_od``), for smoke tests."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    counts = rng.poisson(10.0, size=(744, 2, 2)).astype(np.float32)
    return {
        "stations": ["12TH", "16TH"],
        "start_date": "2011-01-01",
        "counts": jnp.asarray(counts),
    }
