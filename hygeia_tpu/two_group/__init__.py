from hygeia_tpu.two_group.model import TwoGroupParams, make_params, State
from hygeia_tpu.two_group.filter import run_filter
from hygeia_tpu.two_group.backward import backward_simulation

__all__ = [
    "TwoGroupParams",
    "make_params",
    "State",
    "run_filter",
    "backward_simulation",
]
