"""monotonic_rnnt_tpu — a TPU-native monotonic RNN-T training-loss framework.

Brand-new JAX/Pallas implementation with the capabilities of the reference
CUDA/C++ library (SimBe195/monotonic-rnnt): forward-backward monotonic RNN-T
loss with fused log-softmax gradients, alignment-restricted (banded) lattices,
variable-length batching, multi-chip data/vocab sharding, and a
Conformer-transducer model family wired to the loss.

Public API:
  monotonic_rnnt_loss        — padded-layout loss (the TPU-idiomatic entry)
  monotonic_rnnt_loss_packed — reference-compatible packed-layout shim
  Bands / bands_from_alignment — alignment-restriction bands
"""

from .ops.alignment import (ViterbiResult, occupancy_posteriors,
                            occupancy_posteriors_banded, viterbi_alignment,
                            viterbi_alignment_banded)
from .ops.banded import monotonic_rnnt_loss_banded
from .ops.bands import (BandLayout, Bands, band_layout_is_exact,
                        bands_from_alignment, compute_band_layout,
                        default_bands, pack_band, required_band_width,
                        suggested_band_width, unpack_band)
from .ops.chunked import rnnt_loss_fused_joint
from .ops.chunked_banded import rnnt_loss_fused_joint_banded
from .ops.loss import monotonic_rnnt_alignment_score, monotonic_rnnt_loss
from .ops.packing import (monotonic_rnnt_loss_packed, pack_acts, unpack_acts)
from .ops.reference import rnnt_loss_reference
from .utils.config import config_override, get_config, update_config
from .utils.status import RnntError, Status

__version__ = "0.3.0"

__all__ = [
    "monotonic_rnnt_loss",
    "monotonic_rnnt_loss_packed",
    "monotonic_rnnt_alignment_score",
    "viterbi_alignment",
    "viterbi_alignment_banded",
    "occupancy_posteriors",
    "occupancy_posteriors_banded",
    "ViterbiResult",
    "rnnt_loss_reference",
    "rnnt_loss_fused_joint",
    "rnnt_loss_fused_joint_banded",
    "monotonic_rnnt_loss_banded",
    "Bands",
    "BandLayout",
    "bands_from_alignment",
    "default_bands",
    "compute_band_layout",
    "band_layout_is_exact",
    "required_band_width",
    "suggested_band_width",
    "pack_band",
    "unpack_band",
    "pack_acts",
    "unpack_acts",
    "RnntError",
    "Status",
    "get_config",
    "update_config",
    "config_override",
]
