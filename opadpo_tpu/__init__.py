"""opadpo_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of OPA-DPO.

A complete re-implementation of the OPA-DPO pipeline (rollout → GPT-4V
correction → OPA LoRA-SFT → token-weighted multi-pair DPO → hallucination
eval suite) designed TPU-first:

- SPMD over ``jax.sharding.Mesh`` (axes: ``data``, ``model``) instead of
  torchrun DDP / DeepSpeed / NCCL.
- One jitted train-step per stage with donated buffers; optimizer state
  sharded over the data axis (the GSPMD equivalent of ZeRO-1).
- Pallas flash-attention kernels for the training forward/backward and a
  ``lax.while_loop`` token sampler over a statically allocated KV cache
  (the reference's ``config.cache_shape`` trick, reference
  ``opadpo/dpo_models/rl_models.py:157-162``).
- LoRA as a functional transform over parameter pytrees: the frozen DPO
  reference policy is the same compiled forward with a different adapter
  pytree (TPU-native version of the reference's shared-base-model trick,
  ``opadpo/dpo_models/qlora_model.py:66-124``).

Reference: zhyang2226/OPA-DPO (CVPR 2025, arXiv:2501.09695), mounted at
/root/reference. File:line citations in docstrings point there.
"""

__version__ = "0.1.0"
