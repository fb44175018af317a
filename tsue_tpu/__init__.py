"""TSUE-TPU: traffic-context-augmented vehicle trajectory prediction, TPU-native.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch research codebase (imjaegyun/Traffic-Context-Augmented-Vehicle-
Trajectory-Prediction-Framework-Using-Multimodal-LLM), redesigned TPU-first:

- ``tsue_tpu.data``     — fixed-shape, pre-padded preprocessing (ref scripts/train.py:31-347)
- ``tsue_tpu.models``   — Flax modules: lane encoder, Q-Former, Llama+LoRA,
                          LTSF forecaster, TSUE top model, diffusion, baselines
- ``tsue_tpu.ops``      — Pallas TPU kernels with XLA reference paths
- ``tsue_tpu.parallel`` — mesh/sharding utilities (DDP/NCCL -> pjit/ICI)
- ``tsue_tpu.train``    — trainers with freeze regimes as optax masks
- ``tsue_tpu.eval``     — ADE/FDE + vmapped K-candidate MC-dropout metrics
- ``tsue_tpu.viz``      — matplotlib artifact suite
"""

__version__ = "0.1.0"
