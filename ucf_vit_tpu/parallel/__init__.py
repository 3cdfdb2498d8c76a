from ucf_vit_tpu.parallel.mesh import (
    AXIS_DDP,
    AXIS_EP,
    AXIS_FSDP,
    AXIS_SP,
    AXIS_TP,
    DATA_AXES,
    LOGICAL_RULES,
    make_mesh,
    mesh_from_config,
)
from ucf_vit_tpu.parallel.train_step import (
    TrainState,
    create_sharded_train_state,
    make_train_step,
)

__all__ = [
    "AXIS_DDP",
    "AXIS_EP",
    "AXIS_FSDP",
    "AXIS_SP",
    "AXIS_TP",
    "DATA_AXES",
    "LOGICAL_RULES",
    "make_mesh",
    "mesh_from_config",
    "TrainState",
    "create_sharded_train_state",
    "make_train_step",
]
