"""TPU-native rebuild of pomonam/LearnablePoolingMethods (YouTube-8M learnable pooling).

A brand-new JAX / XLA / Pallas framework with the capabilities of the TF1.x
reference: TFRecord frame-feature ingestion as a fixed-shape XLA input stage,
learnable pooling (DBoF / NetVLAD / NetFV / SoftDBoW / NetRVLAD / RNN /
attention & transformer pooling), context gating, Mixture-of-Experts
classification, GAP/Hit@1/PERR evaluation (on-device), ICI data parallelism
via jax.sharding, and flag-compatible train / eval / inference / export
entrypoints.

Reference provenance: the reference mount was empty this build session; the
behavioral contract is reconstructed in /root/repo/SURVEY.md (anchors cited
throughout as ``file.py#Symbol``).
"""

__version__ = "0.1.0"
