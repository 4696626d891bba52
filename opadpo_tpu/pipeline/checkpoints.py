"""Checkpoint directory contract + save/resume.

Keeps the reference's on-disk layout so tooling stays interchangeable
(SURVEY §5 checkpoint/resume):

    output_dir/
      checkpoint-<N>/
        adapter_model/lora_policy/   ← PEFT adapter (adapter_model.bin
                                        + adapter_config.json)
        optimizer.ckpt/              ← orbax: optimizer state + step
        scheduler.json
      checkpoint-final/ ...
      completed                      ← marker file

Discovery = scan ``checkpoint-N`` dirs + ``completed`` marker (reference
``utils/lora_utils.py:31-47``); DPO resume parses the step from the dir
name (``dpo_trainer.py:929-931``) and fast-forwards the dataloader.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional, Tuple

import numpy as np

ADAPTER_MODEL_DIR = "adapter_model"
COMPLETED_MARKER = "completed"
_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def get_last_checkpoint(output_dir: str,
                        ) -> Tuple[Optional[str], bool]:
    """(latest checkpoint dir | None, training_completed)."""
    if not os.path.isdir(output_dir):
        return None, False
    completed = os.path.exists(os.path.join(output_dir, COMPLETED_MARKER))
    best_step, best_dir = -1, None
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best_dir = os.path.join(output_dir, name)
    return best_dir, completed


def parse_checkpoint_step(checkpoint_dir: str) -> int:
    m = _CKPT_RE.match(os.path.basename(os.path.normpath(checkpoint_dir)))
    return int(m.group(1)) if m else 0


def mark_completed(output_dir: str) -> None:
    with open(os.path.join(output_dir, COMPLETED_MARKER), "w") as f:
        f.write("done\n")


def _flatten_numpy(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_numpy(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_numpy(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_train_state(ckpt_dir: str, state, lora_cfg,
                     adapter_name: str = "lora_policy",
                     extra: Optional[dict] = None) -> None:
    """Save adapter + optimizer state.

    Two adapter records are written:
    - PEFT ``adapter_model/<name>/`` with the LLaMA-side LoRA (the format
      the reference's eval stack loads) — vision/projector adapters have
      no PEFT-LLaVA equivalent there;
    - ``adapter_full.ckpt`` (orbax) with the COMPLETE trainable pytree
      (incl. vision-tower/projector adapters from the OPA recipe), used
      preferentially on restore.
    """
    from opadpo_tpu.models.loader import save_peft_adapter
    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    adapter_dir = os.path.join(ckpt_dir, ADAPTER_MODEL_DIR, adapter_name)
    save_peft_adapter(state.params, adapter_dir, lora_cfg)

    ckptr = ocp.StandardCheckpointer()
    for name, payload in (("adapter_full.ckpt", {"params": state.params}),
                          ("optimizer.ckpt",
                           {"opt_state": state.opt_state,
                            "step": state.step})):
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(os.path.abspath(path), payload)
    ckptr.wait_until_finished()

    if extra is not None:
        with open(os.path.join(ckpt_dir, "trainer_state.json"), "w") as f:
            json.dump(extra, f, indent=2)


def restore_train_state(ckpt_dir: str, state, llama_cfg,
                        adapter_name: str = "lora_policy"):
    """Restore adapter + optimizer into a template TrainState."""
    from opadpo_tpu.engine.train_state import TrainState
    from opadpo_tpu.models.loader import load_peft_adapter
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    full_path = os.path.join(ckpt_dir, "adapter_full.ckpt")
    if os.path.exists(full_path):
        restored_params = ckptr.restore(
            os.path.abspath(full_path),
            target={"params": state.params})["params"]
        params = restored_params
    else:
        adapter_dir = os.path.join(ckpt_dir, ADAPTER_MODEL_DIR, adapter_name)
        lora = load_peft_adapter(adapter_dir, llama_cfg)
        # keep any non-llama adapter groups from the template
        params = dict(state.params)
        params["llama"] = lora["llama"]

    target = {"opt_state": state.opt_state, "step": state.step}
    restored = ckptr.restore(
        os.path.abspath(os.path.join(ckpt_dir, "optimizer.ckpt")),
        target=target)
    return TrainState(params=params, opt_state=restored["opt_state"],
                      step=restored["step"])


def find_max_step(rollout_dir: str, rank: Optional[int] = None) -> int:
    """Max completed rollout step from ``step{N}_rank{R}.json`` shards
    (reference generator.py:126-140 resume-by-scanning).  With ``rank``
    given, only that rank's shards count — a restarted rank re-does its own
    missing steps even if other ranks got further."""
    if not os.path.isdir(rollout_dir):
        return 0
    suffix = r"\d+" if rank is None else str(int(rank))
    pattern = re.compile(r"^step(\d+)_rank" + suffix + r"\.json$")
    best = 0
    for name in os.listdir(rollout_dir):
        m = pattern.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best
