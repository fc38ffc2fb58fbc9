"""Model configuration registry.

TPU-native re-design of the reference's litgpt-style config system
(`/root/reference/llm_models/config.py:26-200`, registry at `:3114`): frozen,
hashable dataclasses so configs can be closed over by ``jax.jit`` as static
arguments, plus a name registry covering the model family the reference ships
(`Llama-3.2-{1B,3B,300M,Understanding,Generation,4Layer}`,
reference `config.py:784-899`).

Unlike the reference we only model the architecture family that is actually
reachable from the shipped checkpoints (Llama-style: RMSNorm + SwiGLU +
GQA + full-rotary RoPE with Llama-3 frequency adjustment, no biases, no
parallel residual); the dataclass keeps the knobs needed to widen that later.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Tuple


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k`` (vocab padding)."""
    assert k > 0
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass(frozen=True)
class RoPEAdjustments:
    """Llama-3 style RoPE frequency adjustment (reference `lit_model.py:662-676`)."""

    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_seq_len: int = 8192


@dataclass(frozen=True)
class GPTConfig:
    """Architecture of one decoder-only transformer stack.

    Frozen + hashable so it can be a static argument of jitted functions.
    Field semantics follow the reference config (`llm_models/config.py:26-134`).
    """

    name: str = ""
    block_size: int = 4096
    vocab_size: int = 128000
    padded_vocab_size: Optional[int] = None
    padding_multiple: int = 512
    n_layer: int = 16
    n_embd: int = 2048
    n_head: int = 32
    n_query_groups: Optional[int] = None
    head_size: Optional[int] = None
    rotary_percentage: float = 1.0
    rope_base: float = 500000.0
    rope_adjustments: Optional[RoPEAdjustments] = RoPEAdjustments()
    intermediate_size: Optional[int] = None
    norm_eps: float = 1e-5
    bias: bool = False
    # The unified model wires sub-transformers with identity embedding /
    # identity lm_head (continuous features in / features out), mirroring
    # `_prepare_transformer` (reference `model_new.py:111-115`).
    has_wte: bool = True
    has_lm_head: bool = True
    # Gemma-family options (reference `config.py:70-93`, `lit_model.py:365-367,
    # 483-500,516-531,806-811`). None of the shipped UniAudio configs set
    # these, but the registry keeps the reference's full architecture surface.
    attention_scores_scalar: Optional[int] = None
    attention_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    sliding_window_size: Optional[int] = None
    # per-layer flags (1 = window attention); tuple for hashability.
    # Defaulted to all-1 when a window size is set (reference `config.py:130`).
    sliding_window_indices: Optional[Tuple[int, ...]] = None
    # Mixtral-style MoE MLP (reference `LLaMAMoE`, `lit_model.py:606-631`).
    # Experts are stacked on a leading axis so expert parallelism is one
    # sharding annotation (shard dim 0 over the mesh's model axis).
    n_expert: int = 0
    n_expert_per_token: int = 0
    moe_intermediate_size: Optional[int] = None

    def __post_init__(self):
        if self.head_size is None:
            assert self.n_embd % self.n_head == 0
            object.__setattr__(self, "head_size", self.n_embd // self.n_head)
        if self.padded_vocab_size is None:
            object.__setattr__(
                self, "padded_vocab_size", find_multiple(self.vocab_size, self.padding_multiple)
            )
        if self.n_query_groups is None:
            object.__setattr__(self, "n_query_groups", self.n_head)
        assert self.n_head % self.n_query_groups == 0
        if self.intermediate_size is None:
            object.__setattr__(self, "intermediate_size", 4 * self.n_embd)
        if self.sliding_window_size is not None:
            if self.sliding_window_indices is None:
                object.__setattr__(
                    self, "sliding_window_indices", (1,) * self.n_layer
                )
            else:
                object.__setattr__(
                    self, "sliding_window_indices",
                    tuple(self.sliding_window_indices),
                )
            assert len(self.sliding_window_indices) == self.n_layer
        if self.n_expert:
            assert 0 < self.n_expert_per_token <= self.n_expert
            if self.moe_intermediate_size is None:
                object.__setattr__(
                    self, "moe_intermediate_size", self.intermediate_size
                )

    @property
    def rope_n_elem(self) -> int:
        return int(self.rotary_percentage * self.head_size)

    @property
    def q_per_kv(self) -> int:
        return self.n_head // self.n_query_groups

    def replace(self, **kwargs: Any) -> "GPTConfig":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def from_name(cls, name: str, **overrides: Any) -> "GPTConfig":
        key = _normalize_name(name)
        if key not in _NAME_TO_CONFIG:
            raise ValueError(
                f"{name!r} is not a registered config name. "
                f"Known: {sorted(_NAME_TO_CONFIG)}"
            )
        cfg = dict(_NAME_TO_CONFIG[key])
        cfg.update(overrides)
        return cls(**cfg)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "GPTConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if isinstance(kwargs.get("rope_adjustments"), dict):
            kwargs["rope_adjustments"] = RoPEAdjustments(**kwargs["rope_adjustments"])
        return cls(**kwargs)


def _normalize_name(name: str) -> str:
    # accept "meta-llama/Llama-3.2-3B" and "Llama-3.2-3B"
    return name.split("/")[-1].strip()


def _llama32(name: str, *, n_layer: int, n_embd: int, n_head: int,
             intermediate_size: int) -> Dict[str, Any]:
    """Llama-3.2-family base recipe (reference `config.py:784-899`)."""
    return dict(
        name=name,
        block_size=131072,
        vocab_size=128000,
        padded_vocab_size=128256,
        n_layer=n_layer,
        n_embd=n_embd,
        n_head=n_head,
        n_query_groups=8,
        rotary_percentage=1.0,
        bias=False,
        intermediate_size=intermediate_size,
        rope_base=500000.0,
        rope_adjustments=RoPEAdjustments(
            factor=32.0, low_freq_factor=1.0, high_freq_factor=4.0,
            original_max_seq_len=8192,
        ),
    )


_CONFIGS = [
    # Backbones (reference config.py:784-803, 880-899)
    _llama32("Llama-3.2-1B", n_layer=16, n_embd=2048, n_head=32, intermediate_size=8192),
    _llama32("Llama-3.2-3B", n_layer=28, n_embd=3072, n_head=24, intermediate_size=8192),
    # Local RQ-decoder (reference config.py:804-822)
    _llama32("Llama-3.2-300M", n_layer=4, n_embd=2048, n_head=32, intermediate_size=8192),
    # Experts (reference config.py:823-860)
    _llama32("Llama-3.2-Understanding", n_layer=3, n_embd=3072, n_head=24, intermediate_size=8192),
    _llama32("Llama-3.2-Generation", n_layer=2, n_embd=3072, n_head=24, intermediate_size=8192),
    _llama32("Llama-3.2-4Layer", n_layer=4, n_embd=2048, n_head=32, intermediate_size=8192),
    # Tiny configs for tests / CI (ours; no reference analog)
    dict(name="tiny-backbone", block_size=512, vocab_size=1000, padded_vocab_size=1024,
         n_layer=2, n_embd=64, n_head=4, n_query_groups=2, intermediate_size=128,
         rope_base=10000.0, rope_adjustments=None),
    dict(name="tiny-expert", block_size=512, vocab_size=1000, padded_vocab_size=1024,
         n_layer=1, n_embd=64, n_head=4, n_query_groups=2, intermediate_size=128,
         rope_base=10000.0, rope_adjustments=None),
    dict(name="tiny-decoder", block_size=512, vocab_size=1000, padded_vocab_size=1024,
         n_layer=1, n_embd=32, n_head=4, n_query_groups=2, intermediate_size=64,
         rope_base=10000.0, rope_adjustments=None),
]

_NAME_TO_CONFIG: Dict[str, Dict[str, Any]] = {c["name"]: c for c in _CONFIGS}


def register_config(name: str, **cfg: Any) -> None:
    """Register a new named config (mirrors the reference's open registry)."""
    cfg["name"] = name
    _NAME_TO_CONFIG[name] = cfg


def available_configs() -> Tuple[str, ...]:
    return tuple(sorted(_NAME_TO_CONFIG))


# ---------------------------------------------------------------------------
# Unified-model (Model_stage3-equivalent) configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TokenSpace:
    """Token-space constants of the 9-stream grid.

    The reference reads these from the training yaml
    (`llm_utils/arguments.py:28-44`; consumed by the generators, e.g.
    `evaluation/asr_task.py:196-206`). Audio streams use a two-segment
    vocabulary per codebook: reasoning ids occupy ``[0, reason_card)`` and
    reconstruction ("semantic") ids occupy
    ``[reason_card, reason_card + semantic_card)`` — the generators add
    ``audio_reason_card`` to semantic codes before feeding the grid
    (`asr_task.py:313`).
    """

    audio_reason_card: int = 4100
    audio_semantic_card: int = 8200
    parallel_number: int = 9  # 8 audio codebooks + 1 text stream
    # In-band audio special ids (within each segment's local id space)
    reason_bos: int = 4096
    reason_eos: int = 4097
    reason_pad_token: int = 4098
    semantic_bos: int = 8192
    semantic_eos: int = 8193
    semantic_pad_token: int = 8194
    audio_prompt_bos: int = 8196
    audio_prompt_eos: int = 8197
    # Text stream special ids (Llama-3.2 reserved tokens,
    # reference `asr_task.py:209-213`, `text_tokenizer.py:56-57`)
    text_pad_token: int = 128004
    text_epad_token: int = 128005
    text_eos: int = 128001
    empty_token: int = 0
    # Special text-stream framing tokens (reference `asr_task.py:209-213`);
    # stored as a tuple so the dataclass stays hashable, overridable so tiny
    # test configs can keep ids inside their small vocab.
    special_text: Tuple[Tuple[str, int], ...] = tuple(
        sorted({
            "<think>": 128002, "</think>": 128003, "</answer>": 128005,
            "<transcription>": 128011, "</transcription>": 128012,
            "<lyric>": 128013, "</lyric>": 128014,
            "<caption>": 128015, "</caption>": 128016,
            "<answer>": 128017, "<reason_token>": 128018,
            "<semantic_token>": 128019,
        }.items())
    )

    def special(self, name: str) -> int:
        for k, v in self.special_text:
            if k == name:
                return v
        raise KeyError(name)

    @property
    def num_codebooks(self) -> int:
        return self.parallel_number - 1

    @property
    def audio_vocab(self) -> int:
        return self.audio_reason_card + self.audio_semantic_card


# Special text-stream tokens used to frame conditioning segments
# (reference `evaluation/asr_task.py:209-213`).
SPECIAL_TEXT_TOKENS: Dict[str, int] = {
    "<think>": 128002,
    "</think>": 128003,
    "</answer>": 128005,
    "<transcription>": 128011,
    "</transcription>": 128012,
    "<lyric>": 128013,
    "</lyric>": 128014,
    "<caption>": 128015,
    "</caption>": 128016,
    "<answer>": 128017,
    "<reason_token>": 128018,
    "<semantic_token>": 128019,
}


@dataclass(frozen=True)
class UnifiedModelConfig:
    """Configuration of the unified audio LM (reference `ModelArgs`,
    `model_new.py:190-199`, and the Model_stage3 wiring `:334-355`)."""

    llm_name: str = "Llama-3.2-3B"
    decoder_name: str = "Llama-3.2-300M"
    understanding_expert_name: str = "Llama-3.2-Understanding"
    generation_expert_name: str = "Llama-3.2-Generation"
    tokens: TokenSpace = field(default_factory=TokenSpace)
    # Static decode-engine geometry
    max_seq_len: int = 2048  # backbone/expert KV length (reference model_new.py:560)

    @property
    def backbone(self) -> GPTConfig:
        return GPTConfig.from_name(self.llm_name)

    @property
    def decoder(self) -> GPTConfig:
        return GPTConfig.from_name(self.decoder_name, has_wte=False, has_lm_head=False)

    @property
    def understanding_expert(self) -> GPTConfig:
        return GPTConfig.from_name(
            self.understanding_expert_name, has_wte=False, has_lm_head=False
        )

    @property
    def generation_expert(self) -> GPTConfig:
        return GPTConfig.from_name(
            self.generation_expert_name, has_wte=False, has_lm_head=False
        )

    @classmethod
    def tiny(cls, **kwargs: Any) -> "UnifiedModelConfig":
        """A CPU-testable configuration with the real topology at toy scale."""
        tokens = kwargs.pop(
            "tokens",
            TokenSpace(
                audio_reason_card=40,
                audio_semantic_card=70,
                reason_bos=32, reason_eos=33, reason_pad_token=34,
                semantic_bos=64, semantic_eos=65, semantic_pad_token=66,
                audio_prompt_bos=67, audio_prompt_eos=68,
                text_pad_token=900, text_epad_token=901, text_eos=2,
                special_text=tuple(sorted({
                    "<think>": 902, "</think>": 903, "</answer>": 901,
                    "<transcription>": 911, "</transcription>": 912,
                    "<lyric>": 913, "</lyric>": 914,
                    "<caption>": 915, "</caption>": 916,
                    "<answer>": 917, "<reason_token>": 918,
                    "<semantic_token>": 919,
                }.items())),
            ),
        )
        return cls(
            llm_name="tiny-backbone",
            decoder_name="tiny-decoder",
            understanding_expert_name="tiny-expert",
            generation_expert_name="tiny-expert",
            tokens=tokens,
            max_seq_len=kwargs.pop("max_seq_len", 128),
            **kwargs,
        )

    @classmethod
    def from_train_yaml(cls, d: Mapping[str, Any]) -> "UnifiedModelConfig":
        """Build from a reference-style training yaml namespace
        (key names follow `llm_utils/arguments.py:28-44` /
        `multi_task_inference.py:171-180`)."""
        tokens = TokenSpace(
            audio_reason_card=int(d["audio_reason_card"]),
            audio_semantic_card=int(d["audio_semantic_card"]),
            parallel_number=int(d.get("parallel_number", 9)),
            reason_bos=int(d.get("reason_bos", 4096)),
            reason_eos=int(d.get("reason_eos", 4097)),
            reason_pad_token=int(d.get("reason_pad_token", 4098)),
            semantic_bos=int(d.get("semantic_bos", 8192)),
            semantic_eos=int(d.get("semantic_eos", 8193)),
            semantic_pad_token=int(d.get("semantic_pad_token", 8194)),
            audio_prompt_bos=int(d.get("audio_prompt_bos", 8196)),
            audio_prompt_eos=int(d.get("audio_prompt_eos", 8197)),
            text_pad_token=int(d.get("text_pad_token", 128004)),
        )
        return cls(
            llm_name=_normalize_name(d["llm_name"]),
            decoder_name=_normalize_name(d["local_model"]),
            understanding_expert_name=_normalize_name(
                d.get("understanding_expert", "Llama-3.2-Understanding")
            ),
            generation_expert_name=_normalize_name(
                d.get("generation_expert", "Llama-3.2-Generation")
            ),
            tokens=tokens,
            max_seq_len=int(d.get("max_seq_len", 2048)),
        )
