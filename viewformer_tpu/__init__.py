"""viewformer-tpu: a TPU-native JAX framework for NeRF-free novel view synthesis.

Re-implementation of the capabilities of jkulhanek/viewformer (ECCV 2022,
"ViewFormer: NeRF-free Neural Rendering from Few Images Using Transformers")
as a single TPU-first framework built on jax/XLA/pallas/pjit.

Layer map (mirrors reference SURVEY.md §1):
  L0 cli                -> viewformer_tpu.cli
  L1 config/schedules   -> viewformer_tpu.config, viewformer_tpu.utils.schedules
  L2 loaders            -> viewformer_tpu.data.loaders
  L3 dataset storage    -> viewformer_tpu.data (tfrecord, dataset, pipeline)
  L4 models/ops         -> viewformer_tpu.models, viewformer_tpu.ops
  L5 training           -> viewformer_tpu.train
  L6 evaluation         -> viewformer_tpu.evaluate, viewformer_tpu.commands
  L7 utils              -> viewformer_tpu.utils
"""

__version__ = "0.1.0"
