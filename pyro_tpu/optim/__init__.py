from .optim import (
    Adadelta,
    Adagrad,
    AdagradRMSProp,
    Adam,
    AdamW,
    Adamax,
    ClippedAdam,
    NAdam,
    PyroOptim,
    RAdam,
    RMSprop,
    SGD,
)

__all__ = [
    "Adadelta",
    "Adagrad",
    "AdagradRMSProp",
    "Adam",
    "AdamW",
    "Adamax",
    "ClippedAdam",
    "NAdam",
    "PyroOptim",
    "RAdam",
    "RMSprop",
    "SGD",
]
