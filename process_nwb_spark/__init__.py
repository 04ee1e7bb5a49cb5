"""process_nwb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BouchardLab/process_nwb (see SURVEY.md).

Layers:
- dsp/        pure-NumPy spectral kernels (resample, notch, wavelet, CAR oracle)
- operators/  Spark operators (pack/repack, kernel ops, Catalyst CAR/z-score)
- pipelines   end-to-end preprocessing dataflow with lineage naming
- relational/ the declared relational operator surface (SURVEY §2C) + LLM
              data-pipeline ops (dedup, similarity, text analysis)
- streaming/  Structured Streaming tier on the events table
"""
from .session import get_spark  # noqa: F401
from .pipelines import preprocess, high_gamma_trace, PreprocessResult  # noqa: F401
from .operators.stft import (stft_power, stft_power_batched,  # noqa: F401
                             spectrogram_db, welch_psd)
from .operators.multitaper import dpss_tapers, multitaper_psd  # noqa: F401
from .operators.coherence import (coherence_matrix, stft_complex,  # noqa: F401
                                  wpli_matrix, phase_slope_index,
                                  envelope_correlation)
from .operators.quality import (channel_quality, drop_bad_channels,  # noqa: F401
                                recording_qc)
from .operators.xcorr import cross_correlation, estimate_delays  # noqa: F401
from .operators.pac import (phase_amplitude_coupling,  # noqa: F401
                            phase_locking_value, phase_phase_coupling)
from .operators.epochs import (epoch_trials, erp_average,  # noqa: F401
                               inter_trial_coherence)
from .operators.bursts import detect_bursts  # noqa: F401
from .operators.peaks import detect_peaks  # noqa: F401
from .operators.granger import granger_pairwise  # noqa: F401
from .operators.spatial import csd_reference, electrode_neighbors  # noqa: F401
from .operators.spectral_summary import (band_power, line_noise_snr,  # noqa: F401
                                         EEG_BANDS)
from .operators.features import (hjorth_parameters, spectral_entropy,  # noqa: F401
                                 spectral_edge)

__version__ = "0.1.0"
