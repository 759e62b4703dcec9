"""WaveNet model configuration.

Field names mirror the keys of the reference's ``wavenet_params.json``
(reference: wavenet_params.json, whole file; also the kwargs of
``WaveNetModel.__init__``, wavenet/model.py ≈:70) so reference config files
load unmodified via :func:`WaveNetConfig.from_json`.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

# The reference repo's default dilation schedule: 1..512, five stacks
# (wavenet_params.json).
DEFAULT_DILATIONS: Tuple[int, ...] = tuple(
    [2 ** i for i in range(10)] * 5
)


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    """Hyperparameters of one WaveNet network (shape-defining only).

    Unlike the reference's ``WaveNetModel``, batch size is NOT part of the
    model config — the functional forward works for any leading batch dim,
    and sharding decides how batches map onto the mesh.
    """

    filter_width: int = 2
    sample_rate: int = 16000
    dilations: Tuple[int, ...] = DEFAULT_DILATIONS
    residual_channels: int = 32
    dilation_channels: int = 32
    skip_channels: int = 512
    quantization_channels: int = 256
    use_biases: bool = True
    scalar_input: bool = False
    initial_filter_width: int = 32
    # Global conditioning (the fork's signature feature): speaker embedding.
    gc_channels: Optional[int] = None
    gc_cardinality: Optional[int] = None
    # Local conditioning (WaveNet paper §2.5 — NEW capability, the
    # reference never shipped it): a per-timestep feature stream (e.g.
    # linguistic features or mel frames, upsampled to sample rate — see
    # wavenet_tpu.lc) added to every layer's filter/gate pre-activations
    # through per-layer 1x1 projections. ``lc_channels`` is the feature
    # dim as seen by the network (post-upsampling).
    lc_channels: Optional[int] = None
    # Learned LC upsampling (paper §2.5's "learned mapping" option),
    # expressed TPU-first as repeat-upsample + learned separable conv
    # (depthwise width ``lc_refine_width`` + pointwise mix, identity
    # init) over the sample-rate stream — the resize+conv equivalent of
    # a transposed conv, so the incremental samplers consume the refined
    # stream unchanged. 0 disables (pure repeat/linear upsampling).
    lc_refine_width: int = 0
    # TPU-specific: compute dtype for the conv stack. Params always live in
    # fp32; 'bfloat16' casts activations/weights at the conv inputs and
    # accumulates in fp32 on the MXU. Use 'float32' for reference parity.
    compute_dtype: str = "float32"
    # TPU-specific: rematerialize each dilation layer in the backward pass
    # (jax.checkpoint) — trades ~30% more FLOPs for O(L) x less activation
    # memory; enables long sample_size / large batch on one chip.
    remat: bool = False
    # TPU-specific (EXPERIMENTAL): run the dilated stack through a fused
    # Pallas whole-stack kernel. Requires filter_width == 2.
    use_pallas_stack: bool = False
    # Which fused-stack kernel: 3 = the documented frontier
    # (kernels/fused_stack3.py, default); 1/2 are retired generations
    # kept importable under wavenet_tpu/experiments/ (negative results;
    # all lose to the XLA stack at paper-config shapes).
    pallas_stack_version: int = 3
    # XLA path: run filter+gate as ONE conv with concatenated [fw, R, 2D]
    # weights — identical numerics (the filter|gate split is just output
    # columns; parity-tested in tests/test_model.py), half the conv
    # calls, double the matmul N dim. Measured ~2% faster on v5-lite
    # (19.4 vs 19.8 ms/step, tools/r2_stack_experiments.py), so it is
    # the default; set False for the op-for-op reference layer graph.
    merged_filter_gate: bool = True
    # (A sigmoid-via-tanh "one transcendental" gate variant was measured
    # 14% SLOWER on the XLA path — v5-lite, tools/r2_step_experiments.py
    # — XLA's elementwise is already lane-efficient; see
    # docs/performance.md. It only pays inside Pallas kernels.)

    def __post_init__(self):
        object.__setattr__(self, "dilations", tuple(self.dilations))
        if (self.gc_channels is None) != (self.gc_cardinality is None):
            raise ValueError(
                "gc_channels and gc_cardinality must be set together "
                f"(got {self.gc_channels=}, {self.gc_cardinality=})")
        if self.lc_refine_width and self.lc_channels is None:
            raise ValueError("lc_refine_width requires lc_channels")
        if self.lc_refine_width < 0 or (self.lc_refine_width
                                        and self.lc_refine_width % 2 == 0):
            raise ValueError("lc_refine_width must be 0 (off) or odd, got "
                             f"{self.lc_refine_width}")

    # -- derived -----------------------------------------------------------

    @property
    def gc_enabled(self) -> bool:
        return self.gc_channels is not None

    @property
    def lc_enabled(self) -> bool:
        return self.lc_channels is not None

    @property
    def num_layers(self) -> int:
        return len(self.dilations)

    @property
    def input_channels(self) -> int:
        return 1 if self.scalar_input else self.quantization_channels

    @property
    def receptive_field(self) -> int:
        from wavenet_tpu.utils.receptive_field import calculate_receptive_field
        return calculate_receptive_field(
            self.filter_width, self.dilations, self.scalar_input,
            self.initial_filter_width)

    # -- (de)serialization -------------------------------------------------

    _JSON_KEYS = (
        "filter_width", "sample_rate", "dilations", "residual_channels",
        "dilation_channels", "skip_channels", "quantization_channels",
        "use_biases", "scalar_input", "initial_filter_width",
        # Extension keys (absent from reference param files, which load
        # unchanged): local-conditioning feature dim + learned-upsample
        # refinement width.
        "lc_channels", "lc_refine_width",
    )

    @classmethod
    def from_json(cls, path_or_dict, **overrides) -> "WaveNetConfig":
        """Load from a reference-format wavenet_params.json file or dict.

        Unknown keys are ignored (forward compat); ``overrides`` win, which
        is how the CLIs inject --gc_channels / gc_cardinality the same way
        the reference passed them alongside the JSON params.
        """
        if isinstance(path_or_dict, dict):
            raw = dict(path_or_dict)
        else:
            with open(path_or_dict) as f:
                raw = json.load(f)
        kwargs = {k: raw[k] for k in cls._JSON_KEYS if k in raw}
        kwargs.update(overrides)
        return cls(**kwargs)

    def to_json_dict(self) -> dict:
        return {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in ((key, getattr(self, key)) for key in self._JSON_KEYS)}


# BASELINE.json measurement configs, kept here so tests/bench/CLI agree on
# exactly what "tiny" / "paper" / etc mean.

def tiny_config(**kw) -> WaveNetConfig:
    """10 layers (dilations 1..512), 16 residual / 32 skip channels."""
    d = dict(dilations=tuple(2 ** i for i in range(10)),
             residual_channels=16, dilation_channels=16, skip_channels=32,
             quantization_channels=256)
    d.update(kw)
    return WaveNetConfig(**d)


def paper_config(**kw) -> WaveNetConfig:
    """30 layers (3 stacks of 1..512), 32 residual / 512 skip channels."""
    d = dict(dilations=tuple([2 ** i for i in range(10)] * 3),
             residual_channels=32, dilation_channels=32, skip_channels=512)
    d.update(kw)
    return WaveNetConfig(**d)


def gc_config(**kw) -> WaveNetConfig:
    """paper + 109-speaker VCTK global conditioning."""
    d = dict(dilations=tuple([2 ** i for i in range(10)] * 3),
             residual_channels=32, dilation_channels=32, skip_channels=512,
             gc_channels=32, gc_cardinality=109)
    d.update(kw)
    return WaveNetConfig(**d)


def wide_config(**kw) -> WaveNetConfig:
    """64 residual / 1024 skip channels, scalar input."""
    d = dict(dilations=tuple([2 ** i for i in range(10)] * 3),
             residual_channels=64, dilation_channels=64, skip_channels=1024,
             scalar_input=True, initial_filter_width=32)
    d.update(kw)
    return WaveNetConfig(**d)


def sharded_config(**kw) -> WaveNetConfig:
    """80 layers, 256 residual channels — the model-sharded config."""
    d = dict(dilations=tuple([2 ** i for i in range(10)] * 8),
             residual_channels=256, dilation_channels=256, skip_channels=512)
    d.update(kw)
    return WaveNetConfig(**d)


CONFIGS = {
    "tiny": tiny_config,
    "paper": paper_config,
    "gc": gc_config,
    "wide": wide_config,
    "sharded": sharded_config,
}
