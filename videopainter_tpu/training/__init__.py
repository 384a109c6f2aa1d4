from .train_branch import (
    BranchTrainConfig,
    BranchTrainState,
    make_branch_train_step,
    init_branch_train_state,
)
from .optim import make_optimizer, cosine_with_restarts_schedule

__all__ = [
    "BranchTrainConfig",
    "BranchTrainState",
    "make_branch_train_step",
    "init_branch_train_state",
    "make_optimizer",
    "cosine_with_restarts_schedule",
]
