"""ScorePerformer-TPU: a TPU-native expressive piano performance rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ilya16/ScorePerformer (ISMIR 2023): score→performance rendering with a
hierarchical MMD-VAE style space, SPMuple score/performance tokenization,
and streaming KV-cached generation — built for TPU meshes.
"""

__version__ = "0.1.0"
