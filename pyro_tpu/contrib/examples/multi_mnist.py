"""Multi-MNIST dataset synthesis (ref
``pyro/contrib/examples/multi_mnist.py``; Eslami et al. 2016 AIR).

The composition pipeline (random scale / position / count of digits on a
canvas) is fully local and works with any ``{"digits", "labels"}`` dict;
only the MNIST download itself is gated.
"""

from __future__ import annotations

import os

import numpy as np

from .util import get_data_loader


def imresize(arr, size):
    """Nearest-neighbor resize without PIL (ref :21)."""
    h, w = arr.shape
    out_h, out_w = size
    rows = (np.arange(out_h) * h / out_h).astype(int)
    cols = (np.arange(out_w) * w / out_w).astype(int)
    return arr[rows][:, cols]


def sample_one(canvas_size, mnist, rng=np.random):
    i = rng.randint(mnist["digits"].shape[0])
    digit = mnist["digits"][i]
    label = int(mnist["labels"][i])
    scale = 0.1 * rng.randn() + 1.3
    new_size = tuple(int(s / scale) for s in digit.shape)
    resized = imresize(digit, new_size)
    w = resized.shape[0]
    assert w == resized.shape[1]
    padding = canvas_size - w
    pad_l = rng.randint(0, padding)
    pad_r = rng.randint(0, padding)
    pad_width = ((pad_l, padding - pad_l), (pad_r, padding - pad_r))
    positioned = np.pad(
        resized, pad_width, "constant", constant_values=0
    )
    return positioned, label


def sample_multi(num_digits, canvas_size, mnist, rng=np.random):
    canvas = np.zeros((canvas_size, canvas_size))
    labels = []
    for _ in range(num_digits):
        positioned_digit, label = sample_one(canvas_size, mnist, rng)
        canvas += positioned_digit
        labels.append(label)
    if np.max(canvas) > 255:  # crude overlap check
        return sample_multi(num_digits, canvas_size, mnist, rng)
    return canvas, labels


def mk_dataset(n, mnist, max_digits, canvas_size, rng=np.random):
    x, y = [], []
    for _ in range(n):
        num_digits = rng.randint(max_digits + 1)
        canvas, labels = sample_multi(num_digits, canvas_size, mnist, rng)
        x.append(canvas)
        y.append(labels)
    return np.array(x, dtype=np.uint8), np.array(y, dtype=object)


def load_mnist(root_path):
    loader = get_data_loader("MNIST", root_path)
    return {
        "digits": loader.dataset.data,
        "labels": loader.dataset.targets,
    }


def load(root_path):
    """Cached load (ref :75): generates from MNIST if absent (requires
    the MNIST files to be present locally)."""
    file_path = os.path.join(root_path, "multi_mnist_uint8.npz")
    if os.path.exists(file_path):
        data = np.load(file_path, allow_pickle=True)
        return data["x"], data["y"]
    rng_state = np.random.get_state()
    np.random.seed(681307)
    mnist = load_mnist(root_path)
    x, y = mk_dataset(60000, mnist, 2, 50)
    np.random.set_state(rng_state)
    np.savez_compressed(file_path, x=x, y=y)
    return x, y
