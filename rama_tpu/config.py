"""Model and engine configuration.

Mirrors the semantics of the reference's two config layers:
- model hyperparameters parsed from the checkpoint binary header
  (reference: engine/src/transformer/mod.rs:128-167 `Config::from_file`)
- engine runtime knobs (reference: engine/src/lib.rs:15-46 `EngineConfig`)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    """Llama-family model hyperparameters.

    The v0 llama2.c binary header is 7 little-endian int32s:
    (dim, hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size, seq_len).
    A negative vocab_size encodes an *unshared* classifier head
    (reference: engine/src/transformer/mod.rs:150-158; export.py:84-86).
    """

    dim: int
    hidden_dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    vocab_size: int
    seq_len: int
    shared_classifier: bool = True
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @property
    def n_rep(self) -> int:
        """Query heads per KV head (GQA group size)."""
        return self.n_heads // self.n_kv_heads

    def __post_init__(self):
        if self.dim % self.n_heads != 0:
            raise ValueError(f"dim={self.dim} not divisible by n_heads={self.n_heads}")
        if self.n_heads % self.n_kv_heads != 0:
            raise ValueError(
                f"n_heads={self.n_heads} not divisible by n_kv_heads={self.n_kv_heads}"
            )

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class EngineConfig:
    """Runtime knobs for generation and serving.

    Defaults follow the reference (engine/src/lib.rs:27-35): steps=255,
    temperature=1.0, top_p=0.9.
    """

    model_path: str = ""
    tokenizer_path: str = ""
    steps: int = 255
    temperature: float = 1.0
    top_p: float = 0.9
    seed: int = 100

    # Serving / batching knobs (no reference equivalent — the reference runs one
    # unbatched generation per request; see SURVEY.md §5).
    max_batch_size: int = 8
    # Decode steps per device dispatch. Each engine tick runs this many
    # sampled decode steps in one on-device lax.scan, amortizing the
    # host<->device round-trip (the dominant serving cost on dispatch-bound
    # setups). Slots that finish mid-tick overshoot speculatively; the extra
    # tokens are discarded host-side and their KV writes are never attended.
    decode_tick: int = 8
    max_seq_len: int | None = None  # None -> model seq_len
    paged_kv: bool = False          # page-pool cache instead of dense slots
    kv_page_size: int = 128
    kv_num_pages: int | None = None  # None -> worst case (batch * pages/slot)
    # Chunked prefill: prompts longer than this admit through a background
    # prefill job — one (k, prefill_chunk) forward per engine loop iteration
    # interleaved with decode ticks — so a 2048-token admission stalls active
    # streams by one chunk (~35 ms at 7B) instead of one whole-prompt
    # dispatch (~280 ms). 0 = off (whole-prompt bucketed prefill only).
    # Must be a power of two >= 16 when set.
    prefill_chunk: int = 0
    # Engage threshold for the chunked job: only prompts LONGER than this
    # route through it; shorter ones take the direct single-dispatch path
    # even when prefill_chunk is set (a 256-token prompt is cheaper as one
    # dispatch than as chunks + finisher). None -> 4 * prefill_chunk. The
    # r4 A/B ran with threshold == chunk and tripled mid-size TTFT for no
    # stall win (VERDICT r4 weak #2).
    prefill_chunk_min: int | None = None

    # Compute knobs.
    dtype: str = "bfloat16"  # activation / weight compute dtype
    quant: str | None = None  # None | "int8" | "int4" (weight-only group quant)
    quant_group_size: int = 64
    # Stored dtype for weight-quantization scales: None (keep as loaded,
    # f32) | "bf16". f32 scales are ~14% of a 7B int4 weight stream and ~8%
    # of int8 (r5 profile); kernels upcast scales in VMEM either way, so
    # bf16 storage trims HBM traffic for a <=2^-9 per-scale rounding
    # (~0.1% weight perturbation — far under int4's own quantization
    # error). Streams change numerically vs f32-scale serving (an opt-in
    # quality/bandwidth trade, like kv_quant).
    scale_dtype: str | None = None
    # KV-cache quantization: None | "int8" (per-token-per-head absmax; halves
    # cache HBM traffic and doubles slot capacity). Composes with dense slots,
    # the paged pool, and tensor parallelism (tests/test_paged.py,
    # tests/test_kv_quant.py).
    kv_quant: str | None = None

    # Speculative serving: draft this many tokens per verification round by
    # per-slot n-gram prompt lookup and verify the whole chunk in ONE batched
    # chunk forward (one weight stream for up to spec_tick+1 emitted tokens
    # per slot). 0 = off (plain decode_tick scan). Composes with every other
    # feature: tensor/data parallelism, multi-host, the int8 KV cache, and
    # the paged pool — including paged x mesh via the shard_mapped paged spec
    # tick (tests/test_tp.py, tests/test_kv_quant.py, tests/test_paged.py).
    spec_tick: int = 0
    # Speculative rounds per device dispatch: drafting runs ON-DEVICE (the
    # vmapped n-gram proposer over a per-slot history matrix), so one
    # dispatch scans spec_rounds draft->verify->accept rounds and the fixed
    # host round-trip (~25 ms over a remote-TPU tunnel) amortizes over all
    # of them — the spec analogue of decode_tick. Successive spec dispatches
    # also CHAIN like plain ticks (the next scan launches from the previous
    # one's device-resident token/position/history carries before its
    # samples are fetched), hiding the remaining round-trip entirely while
    # the admission queue is idle. Clamped to powers of two; shrunk near
    # token budgets and the cache end (m=0 falls back to the plain tick).
    # Only read when spec_tick > 0.
    spec_rounds: int = 4
    # Proposer for speculative serving: "ngram" (prompt-lookup over the
    # per-slot history matrix, zero extra weights) or "draft" (a small
    # resident draft model proposes spec_tick greedy tokens per round inside
    # the spec scan; pass draft=(draft_cfg, draft_params) to Engine, or
    # --spec-draft-model to the CLI/server). On real text a trained draft
    # model accepts far more than prompt lookup; either way the emitted
    # stream is bit-identical to plain decoding (sample-then-compare keyed
    # by position). Only read when spec_tick > 0.
    spec_mode: str = "ngram"
    # Adaptive speculation: because speculation is a pure latency/throughput
    # knob (spec on/off emits bit-identical streams — sampling is keyed by
    # (slot, position)), the engine can switch it off when drafts don't
    # land. When the rolling per-round accept fraction (accepted / k over
    # the last spec rounds) stays below spec_min_accept, spec goes DORMANT
    # for 64 plain (chained) ticks, then probes again with a couple of spec
    # dispatches. A spec round costs ~1.15x a plain step and emits
    # 1 + frac*k tokens vs the step's 1, so break-even is frac ~ 0.15/k
    # (~0.05 at k=3); 0.1 keeps a margin. Set to 0 to always speculate.
    spec_min_accept: float = 0.1

    # Parallelism knobs: the engine builds a (dp_size, tp_size) device mesh.
    # tp shards weights and KV heads over `model` (Megatron layout); dp
    # shards the slot batch over `data` (dp_size must divide max_batch_size).
    # The paged pool shards its page dimension over `data` too: each replica
    # owns a private sub-pool with its own allocator (kv_num_pages, when
    # set, must be divisible by dp_size).
    tp_size: int = 1
    dp_size: int = 1
    # Sequence-parallel serving: repurpose the `model` axis to shard the KV
    # cache's SEQUENCE dim instead of attention heads (parallel/seqpar.py —
    # blockwise attention + flash combine; weights replicated). The
    # long-context mode: per-chip attention reads scale as S/tp_size and
    # cache capacity scales with the mesh, while the weight stream stays
    # constant. Requires tp_size > 1 and tp_size | max_seq_len; dense cache
    # only (no paged/spec/chunked-prefill composition yet).
    seq_par: bool = False

    # Persistent XLA compilation cache directory (None = off). With it set,
    # Engine.warmup()'s program grid compiles once per machine; later server
    # starts reload each program from disk in milliseconds.
    compile_cache: str | None = None
