"""Model configuration for the TPU-native scOT (Poseidon) rebuild.

Mirrors the semantics of the reference ``ScOTConfig``
(/root/reference/scOT/model.py:66-132) and the named sizes in ``MODEL_MAP``
(/root/reference/scOT/train.py:35-72), expressed as a frozen dataclass so it can
be treated as a static (hashable) argument under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ScOTConfig:
    """Static architecture + loss configuration.

    All sequence-typed fields are tuples so the config is hashable and can be
    closed over by jitted functions without retracing surprises.
    """

    image_size: int = 224
    patch_size: int = 4
    num_channels: int = 3
    num_out_channels: int = 1
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    skip_connections: Tuple[int, ...] = (2, 2, 2, 0)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    drop_path_rate: float = 0.1
    hidden_act: str = "gelu"
    use_absolute_embeddings: bool = False
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    # p-norm of the training loss: 1 -> L1, 2 -> L2 (reference model.py:96).
    p: int = 1
    # Cumulative channel-group boundaries for the normalized loss, e.g.
    # (0, 1, 3, 4) for "[rho],[u,v],[p]" (reference model.py:97).
    channel_slice_list_normalized_loss: Optional[Tuple[int, ...]] = None
    # Residual skip-block family: "convnext" or "resnet" (reference model.py:98).
    residual_model: str = "convnext"
    # Lead-time conditioning via ConditionalLayerNorm (reference model.py:99).
    use_conditioning: bool = False
    # Predict the residual w.r.t. the input instead of the full state; the
    # reference forces this off unless conditioning is on (model.py:120-122).
    learn_residual: bool = False
    # Attention implementation: "xla" (pure jnp, XLA-fused) or "pallas"
    # (fused VMEM-resident TPU kernel; falls back to interpret mode off-TPU).
    attention_impl: str = "xla"
    # Attention score dtype: "float32" (reference numerics, default) or
    # "bfloat16" (opt-in speed mode: halves the score-tensor HBM traffic that
    # dominates the step time; softmax runs in bf16 so results deviate from
    # the fp32 reference — do not use for checkpoint-parity evaluation).
    score_dtype: str = "float32"
    # Compile the transformer stages as lax.scan over (unshifted, shifted)
    # block pairs: identical numerics, ~depth/2x smaller HLO and much faster
    # XLA compiles. Params gain a leading pair axis (stage_{i}_pairs/...);
    # the hub bridge handles both layouts. Stages with odd depth fall back
    # to the unrolled form.
    scan_blocks: bool = False
    # Under attention_impl="pallas": fuse MLP + ConditionalLayerNorm +
    # residual into one D-major kernel for lane-aligned stages (ops/mlp.py
    # fused_mlp_cln). MEASURED NEGATIVE at ScOT-B b128 on v5e: 188.6 ms
    # device span fused vs 184.7 unfused (r3 traces) — the kernel wins in
    # isolation (852 vs 1215 us/block stage-0 fwd+bwd) but in-model XLA
    # fuses the norm+residual into neighbors more cheaply than the kernel's
    # recompute epilogue. Kept as an A/B knob; numerics agree either way.
    fused_block_tail: bool = False
    # Under attention_impl="pallas": minimum token tile for the row-flattened
    # fused MLP kernel to beat XLA (None -> the POSEIDON_MLP_MIN_TILE env
    # gate, default 256 — the threshold measured on ScOT-B's geometries,
    # scripts/mlp_roofline.py). ScOT-L's stage-1 (C=384, F=1536) caps at
    # token tile 128 for VMEM — just under the B-derived gate — yet the
    # kernel WINS at L's shapes (r5 sweep: 235.7 ms device span vs 238.5
    # base at b64), so make_config("L") sets 128.
    mlp_min_win_tile: Optional[int] = None

    def __post_init__(self):
        object.__setattr__(self, "depths", tuple(self.depths))
        object.__setattr__(self, "num_heads", tuple(self.num_heads))
        object.__setattr__(self, "skip_connections", tuple(self.skip_connections))
        if self.channel_slice_list_normalized_loss is not None:
            object.__setattr__(
                self,
                "channel_slice_list_normalized_loss",
                tuple(self.channel_slice_list_normalized_loss),
            )
        if not self.use_conditioning and self.learn_residual:
            # Matches reference behavior (model.py:120-122).
            object.__setattr__(self, "learn_residual", False)
        if self.residual_model not in ("convnext", "resnet"):
            raise ValueError("residual_model must be 'convnext' or 'resnet'")
        if self.p not in (1, 2):
            raise ValueError("p must be 1 or 2")

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def hidden_size(self) -> int:
        # reference model.py:127
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2**i)

    def stage_resolution(self, i: int) -> int:
        return self.grid_size // (2**i)

    def stage_window_and_shift(self, i: int, shifted: bool) -> Tuple[int, int]:
        """Window size and shift for stage ``i``, with the reference's clamping:
        window is clamped to the stage resolution and shift is disabled when the
        resolution fits in one window (reference model.py:412-440)."""
        res = self.stage_resolution(i)
        window = min(self.window_size, res)
        shift = (self.window_size // 2) if (shifted and res > window) else 0
        return window, shift

    def replace(self, **kwargs) -> "ScOTConfig":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ScOTConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ScOTConfig":
        return cls.from_dict(json.loads(s))


# Named model sizes (reference train.py:35-72). All share heads/skips/window/
# patch/mlp_ratio; T/S differ in depth, S/B/L in width.
_COMMON = dict(
    num_heads=(3, 6, 12, 24),
    skip_connections=(2, 2, 2, 0),
    window_size=16,
    patch_size=4,
    mlp_ratio=4.0,
)

MODEL_MAP = {
    "T": dict(_COMMON, depths=(4, 4, 4, 4), embed_dim=48),
    "S": dict(_COMMON, depths=(8, 8, 8, 8), embed_dim=48),
    "B": dict(_COMMON, depths=(8, 8, 8, 8), embed_dim=96),
    "L": dict(_COMMON, depths=(8, 8, 8, 8), embed_dim=192),
}


def make_config(
    model_name: str = "B",
    *,
    image_size: int = 128,
    num_channels: int,
    num_out_channels: int,
    channel_slice_list: Optional[Sequence[int]] = None,
    use_conditioning: bool = True,
    **overrides,
) -> ScOTConfig:
    """Build a config for a named size with the training defaults the reference
    uses (train.py:247-275): qkv_bias on, dropouts 0, no absolute embeddings,
    L1 channel-group-normalized loss, convnext skip blocks."""
    if model_name not in MODEL_MAP:
        raise ValueError(f"Unknown model size {model_name!r}; choose from {sorted(MODEL_MAP)}")
    base = dict(
        image_size=image_size,
        num_channels=num_channels,
        num_out_channels=num_out_channels,
        qkv_bias=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        hidden_act="gelu",
        use_absolute_embeddings=False,
        initializer_range=0.02,
        layer_norm_eps=1e-5,
        p=1,
        channel_slice_list_normalized_loss=(
            tuple(channel_slice_list) if channel_slice_list is not None else None
        ),
        residual_model="convnext",
        use_conditioning=use_conditioning,
        learn_residual=False,
    )
    base.update(MODEL_MAP[model_name])
    if model_name == "L":
        # Measured on-device (r5 L sweep, BASELINE.md): the fused MLP kernel
        # wins at L's stage shapes with a 128 token tile; B's gate stays 256.
        base["mlp_min_win_tile"] = 128
    base.update(overrides)
    return ScOTConfig(**base)
