"""Receptive-field arithmetic for dilated causal conv stacks.

Mirrors the behavior of the reference's static method
``WaveNetModel.calculate_receptive_field`` (reference: wavenet/model.py ≈:120):

    receptive_field = (filter_width - 1) * sum(dilations) + 1
    receptive_field += (initial_filter_width - 1) if scalar_input
                       else (filter_width - 1)

i.e. the initial "causal" layer contributes ``filter_width - 1`` extra
samples (or ``initial_filter_width - 1`` in scalar-input mode), on top of
the dilated stack's ``(filter_width - 1) * sum(dilations)``.
"""

from __future__ import annotations

from typing import Sequence


def calculate_receptive_field(
    filter_width: int,
    dilations: Sequence[int],
    scalar_input: bool = False,
    initial_filter_width: int = 32,
) -> int:
    """Number of input samples a single output sample depends on."""
    receptive_field = (filter_width - 1) * sum(dilations) + 1
    if scalar_input:
        receptive_field += initial_filter_width - 1
    else:
        receptive_field += filter_width - 1
    return receptive_field
