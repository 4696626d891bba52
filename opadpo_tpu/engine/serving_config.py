"""ONE constructor for every serving/rollout program configuration.

serve.py, bench.py's serving loop, scripts/bench_serve.py, and the
rollout slot-pool driver previously built their SamplingConfig and
ContinuousEngine arguments independently; any drift in a
program-affecting value (sampling params, bucket geometry, segment
length) silently re-pays multi-minute device compiles — at round 4 the
bench's ``eos_token_id=-1`` hashed different decode programs than
serve.py's tokenizer eos and recompiled for ~18 min inside a budgeted
bench.  eos/pad are now traced program ARGUMENTS (decode_loop_unrolled
``eos_id``/``pad_id``), so they can differ freely; everything else that
shapes the compiled HLO is pinned here.

Reference counterpart: HF ``generate`` kwargs assembled ad-hoc at each
call site (``online_generator.py:292-309``, ``model_vqa.py``).
"""

from __future__ import annotations

from typing import Optional

from opadpo_tpu.engine.sampling import SamplingConfig

# Rollout sampling recipe (reference run/online_generate.sh:75-77,115-116)
# — also the serving default so all entry points share compiled programs.
SERVING_TEMPERATURE = 1.0
SERVING_TOP_K = 30
SERVING_TOP_P = 0.95

# ContinuousEngine geometry: every field here changes the compiled
# program set (cache length, segment program, admission buckets).
ENGINE_GEOMETRY = dict(
    qlen=128,           # prompt bucket (left-pad/truncate)
    seg_len=64,         # scheduling quantum
    su_bucket=256,      # watermark bucketing for decode reads
    max_admit_group=4,  # grouped-admission prefill buckets 1/2/4
)


def make_serving_sampling(
    *,
    max_new_tokens: int = 512,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    temperature: float = SERVING_TEMPERATURE,
    top_k: int = SERVING_TOP_K,
    top_p: float = SERVING_TOP_P,
    greedy: bool = False,
    topk_impl: str = "sort",
) -> SamplingConfig:
    """The canonical serving/rollout SamplingConfig.  ``max_new_tokens``
    sizes the KV cache (program-affecting); eos/pad ride as traced args
    in the decode programs, so a bench that never wants EOS termination
    can pass ``eos_token_id=-1`` WITHOUT forking compiled programs."""
    return SamplingConfig(
        temperature=temperature, top_k=top_k, top_p=top_p, greedy=greedy,
        topk_impl=topk_impl, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, max_new_tokens=max_new_tokens)


def make_continuous_engine(
    cfg,
    sampling: SamplingConfig,
    params: dict,
    *,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    slots: int = 16,
    kv_bits: int = 8,
    seg_len: Optional[int] = None,
    qlen: Optional[int] = None,
    max_admit_group: Optional[int] = None,
    rng=None,
    spec_k: int = 0,
    spec_draft: str = "ngram",
    collect_spec_stats: bool = False,
):
    """Construct a ContinuousEngine with the pinned geometry.  Overrides
    exist for measured deviations (13B caps max_admit_group at 1-2); the
    default path is what serve.py, bench.py, and the rollout driver all
    share, so their compiled programs coincide."""
    from opadpo_tpu.engine.continuous import ContinuousEngine

    geo = dict(ENGINE_GEOMETRY)
    if seg_len is not None:
        geo["seg_len"] = seg_len
    if qlen is not None:
        geo["qlen"] = qlen
    if max_admit_group is not None:
        geo["max_admit_group"] = max_admit_group
    return ContinuousEngine(
        cfg, sampling, params, lora=lora, lora_scaling=lora_scaling,
        max_batch=slots, kv_bits=kv_bits, rng=rng, spec_k=spec_k,
        spec_draft=spec_draft, collect_spec_stats=collect_spec_stats,
        **geo)
