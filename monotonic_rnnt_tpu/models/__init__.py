"""Conformer-transducer model family (reference §7.7 integration target).

Public surface:
  ConformerConfig / ConformerEncoder     — acoustic encoder (causal option)
  PredictorConfig / LstmPredictor / ConvPredictor — label-context networks
  TransducerConfig / MonotonicTransducer — encoder + predictor + joint + loss,
      with greedy_decode, beam_search_decode (merge_paths; lm=/lm_weight=
      shallow fusion following the lm.py protocol, BigramLm reference), and
      exact chunked streaming inference (streaming_init / streaming_step;
      streaming_beam_init / streaming_beam_step carry a beam + LM across
      chunks, all with a conformer.streaming_lookback-sized history)
  train: create_train_state, train_step, make_sharded_train_step,
      make_tp_sharded_train_step / shard_train_state / transducer_tp_specs
      (vocab-TP fused-joint training), save_checkpoint, restore_checkpoint
"""

from .conformer import ConformerConfig, ConformerEncoder
from .predictor import ConvPredictor, LstmPredictor, PredictorConfig
from .transducer import Joint, MonotonicTransducer, TransducerConfig

__all__ = [
    "ConformerConfig", "ConformerEncoder", "PredictorConfig",
    "LstmPredictor", "ConvPredictor", "TransducerConfig",
    "MonotonicTransducer", "Joint",
]
