from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, initialize_multihost,
                   local_batch_slice, make_mesh, replicated)
from .data_parallel import make_data_parallel_loss, make_per_sample_loss
from .sharding import (make_dp_tp_banded_loss, make_dp_tp_fused_banded_loss,
                       make_dp_tp_fused_loss, make_dp_tp_loss,
                       rnnt_loss_banded_vocab_sharded,
                       rnnt_loss_vocab_sharded)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "data_sharding", "replicated",
    "initialize_multihost", "local_batch_slice", "make_data_parallel_loss",
    "make_per_sample_loss", "make_dp_tp_loss", "make_dp_tp_banded_loss",
    "make_dp_tp_fused_loss", "make_dp_tp_fused_banded_loss",
    "rnnt_loss_vocab_sharded", "rnnt_loss_banded_vocab_sharded",
]
