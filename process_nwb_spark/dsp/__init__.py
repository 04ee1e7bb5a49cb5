from .padding import next_fast_len, pad_plan, smart_pad, reflect_limited_pad, trim  # noqa: F401
from .filterbank import (  # noqa: F401
    log_spaced_cfs, const_q_sds, chang_sds, gaussian_kernel, hamming_kernel,
    band_params, check_nyquist, get_filterbank, bands_df,
)
from .kernels import (  # noqa: F401
    resample_num, resample_kernel, resample, apply_linenoise_notch,
    analytic_fft, wavelet_transform, car, subtract_car,
)
