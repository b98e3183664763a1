"""jegal_tpu — a TPU-native (JAX/XLA/Pallas) framework for tri-modal
gesture/audio/language embeddings, re-designed from scratch with the
capabilities of the JEGAL reference (Sindhu-Hegde/jegal).

Layout:
  core/      pure-JAX NN primitives (linear, layernorm variants, conv, transformer)
  ops/       DSP + fused ops (mel frontend, masked attention, segment pooling, Pallas kernels)
  models/    GestSync visual tower, XLM-R text encoder, JEGAL tri-modal model
  text/      tokenization + text-file parsing (word boundaries)
  data/      CSV datasets, padding/bucketing, batch collation
  host/      native (C++/libav) media decode + host->device feeder pipeline
  parallel/  device mesh + sharding helpers (pjit/shard_map)
  eval/      retrieval / spotting / ASD metrics + heatmaps
  convert/   torch .pth / HF checkpoint -> parameter pytree converters
  cli/       command-line drivers mirroring the reference's public surface
"""

__version__ = "0.1.0"
