from .config import MPCConfig
from .linearize import linearize_bicycle
from .reference import compute_reference
from .condense import condense
from .qp import solve_box_qp, kkt_residuals
from .controller import ControllerState, init_controller_state, mpc_step

__all__ = [
    "MPCConfig",
    "linearize_bicycle",
    "compute_reference",
    "condense",
    "solve_box_qp",
    "kkt_residuals",
    "ControllerState",
    "init_controller_state",
    "mpc_step",
]
