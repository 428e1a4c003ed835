from keypoint_bench_tpu.runtime.loader import (NativePrefetcher,
                                               load_pnm_resized,
                                               native_available)
