"""Biosequence dataset utilities (MuE).

Ref ``pyro/contrib/mue/dataloaders.py:37`` (``BiosequenceDataset``) and
``write:143``.  Pure numpy/jnp — sequences are one-hot encoded host-side
and shipped to device as a single padded array (variable length is
represented by zero-padding, which :class:`MissingDataDiscreteHMM`
interprets as missing data).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

alphabets = {
    "amino-acid": np.array(
        [
            "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I",
            "L", "K", "M", "F", "P", "S", "T", "W", "Y", "V",
        ]
    ),
    "dna": np.array(["A", "C", "G", "T"]),
}


class BiosequenceDataset:
    """Load biological sequence data from a fasta file or a list of
    strings (ref ``dataloaders.py:37``)."""

    def __init__(
        self,
        source,
        source_type="list",
        alphabet="amino-acid",
        max_length=None,
        include_stop=False,
    ):
        self.include_stop = include_stop
        if source_type == "list":
            seqs = [seq + include_stop * "*" for seq in source]
        elif source_type == "fasta":
            seqs = self._load_fasta(source)
        else:
            raise ValueError(f"unknown source_type {source_type!r}")

        self.L_data = jnp.asarray(
            [float(len(seq)) for seq in seqs], jnp.result_type(float)
        )
        if max_length is None:
            self.max_length = int(max(len(seq) for seq in seqs))
        else:
            self.max_length = max_length
        self.data_size = len(seqs)

        if isinstance(alphabet, str) and alphabet in alphabets:
            alphabet = alphabets[alphabet]
        else:
            alphabet = np.array(list(alphabet))
        if self.include_stop:
            alphabet = np.array(list(alphabet) + ["*"])
        self.alphabet = alphabet
        self.alphabet_length = len(alphabet)

        self.seq_data = jnp.asarray(
            np.stack(
                [
                    self._one_hot(seq, alphabet, self.max_length)
                    for seq in seqs
                ]
            )
        )

    def _load_fasta(self, source):
        """Basic multiline fasta parser (ref :102)."""
        seqs = []
        seq = ""
        with open(source, "r") as fr:
            for line in fr:
                if line[0] == ">":
                    if seq != "":
                        if self.include_stop:
                            seq += "*"
                        seqs.append(seq)
                        seq = ""
                else:
                    seq += line.strip("\n")
        if seq != "":
            if self.include_stop:
                seq += "*"
            seqs.append(seq)
        return seqs

    @staticmethod
    def _one_hot(seq, alphabet, length):
        oh = (np.array(list(seq))[:, None] == alphabet[None, :]).astype(
            np.float32
        )
        pad = np.zeros((length - len(seq), len(alphabet)), np.float32)
        return np.concatenate([oh, pad])

    def __len__(self):
        return self.data_size

    def __getitem__(self, ind):
        return (self.seq_data[ind], self.L_data[ind])

    def batches(self, batch_size, *, rng=None):
        """Yield (seq_data, L_data) minibatches; shuffles if ``rng`` (a
        numpy Generator or seed) is given."""
        order = np.arange(self.data_size)
        if rng is not None:
            np.random.default_rng(rng).shuffle(order)
        for i in range(0, self.data_size, batch_size):
            idx = order[i : i + batch_size]
            yield self.seq_data[idx], self.L_data[idx]


def write(x, alphabet, file, truncate_stop=False, append=False, scores=None):
    """Write one-hot sequence samples to a fasta file (ref
    ``dataloaders.py:143``)."""
    x = np.asarray(x)
    print_alphabet = np.array(list(alphabet) + [""])
    x = np.concatenate([x, np.zeros(x.shape[:2] + (1,))], -1)
    if truncate_stop:
        is_stop = (print_alphabet == "*").astype(np.float64)
        mask = (np.cumsum(x @ is_stop, -1) > 0).astype(np.float64)
        x = x * (1 - mask)[..., None]
        x[:, :, -1] = mask
    else:
        x[:, :, -1] = (x.sum(-1) < 0.5).astype(np.float64)
    index = (x @ np.arange(x.shape[-1], dtype=np.float64)).astype(np.int64)
    if scores is None:
        seqs = [
            ">{}\n".format(j) + "".join(elem) + "\n"
            for j, elem in enumerate(print_alphabet[index])
        ]
    else:
        seqs = [
            ">{}\n".format(j) + "".join(elem) + "\n"
            for j, elem in zip(scores, print_alphabet[index])
        ]
    with open(file, "a" if append else "w") as fw:
        fw.writelines(seqs)
