from hygeia_tpu.single_group.model import (
    SingleGroupModel,
    make_model,
    theta_to_parameters,
    parameters_to_theta,
)
from hygeia_tpu.single_group.engine import run_online_combined_inference

__all__ = [
    "SingleGroupModel",
    "make_model",
    "theta_to_parameters",
    "parameters_to_theta",
    "run_online_combined_inference",
]
