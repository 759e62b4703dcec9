"""wavenet_tpu: a TPU-native WaveNet framework (JAX / XLA / Pallas).

Package facade mirroring the reference's ``wavenet/__init__.py`` re-exports
(WaveNetModel/AudioReader/ops there; config+functional model+reader here).
"""

from wavenet_tpu.audio import (
    mu_law_decode,
    mu_law_decode_np,
    mu_law_encode,
    mu_law_encode_np,
    read_wav,
    trim_silence,
    write_wav,
)
from wavenet_tpu.models.config import CONFIGS, WaveNetConfig
from wavenet_tpu.models.wavenet import (
    forward,
    forward_codes,
    init_params,
    loss_fn,
    one_hot,
    predict_proba,
)
from wavenet_tpu.kernels.sampler import (
    generate_pallas,
    generate_pallas_resumable,
    prefill_carry,
)
from wavenet_tpu.sample import (
    extend_state,
    generate,
    generate_sharded,
    prefill_state,
)
from wavenet_tpu.lc import fit_lc_to_length, load_lc_sidecar, upsample_lc
from wavenet_tpu.features import log_mel_spectrogram, mel_filterbank
from wavenet_tpu.score import log_likelihood, log_likelihood_streaming
from wavenet_tpu.speculative import generate_speculative
from wavenet_tpu.distill import distill_draft
from wavenet_tpu.ops.conv import (
    batch_to_time,
    causal_conv,
    causal_conv_padded,
    time_to_batch,
)
from wavenet_tpu.utils.receptive_field import calculate_receptive_field

__version__ = "0.1.0"
