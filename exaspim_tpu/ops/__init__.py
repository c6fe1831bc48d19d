"""Device-side compute ops: filters, SSIM, metrics, BM4D kernels."""
