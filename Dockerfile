# Container recipe for the TPU-native XMM super-resolution / de-noising
# framework — the parity analog of the reference's Dockerfile
# (/root/reference/Dockerfile:1-13, which layers torch/lightning tooling on
# the xmm-epicpn-simulator base). This image targets Cloud TPU VMs instead:
# the TPU runtime (libtpu) is provided by `jax[tpu]` from Google's release
# index, so the image is a plain Python base plus this package.
#
# Build:   docker build -t xmmsr-tpu .
# Run on a TPU VM (the TPU device nodes must be passed through):
#   docker run --privileged --net=host \
#     -v /path/to/data:/data xmmsr-tpu \
#     xmmsr infer --fits /data/pn_detxy_20ks.fits --checkpoint /data/w.npz \
#       --out /data/out --run_config res/configs/runs/esr_gen_sr.toml
#
# CPU-only usage (tests, event-pipeline preprocessing, CPU inference) works
# in any environment: JAX_PLATFORMS=cpu xmmsr ...

FROM python:3.11-slim

# g++ and zlib headers are needed for the native FITS batch decoder
# (native/fits_reader.cc), which data/native_loader.py compiles on first
# use; the package falls back to the pure-Python reader without them.
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libc6-dev zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY xmm_superres_denoise_tpu ./xmm_superres_denoise_tpu
COPY res ./res
COPY native ./native

# jax[tpu] pulls libtpu from Google's index; on non-TPU hosts JAX falls
# back to CPU at import time.
RUN pip install --no-cache-dir -e .[tpu] \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# Pre-build the optional native decoder (data/native_loader.py would also
# compile it lazily on first use; the Python fallback is numerically
# identical either way).
RUN g++ -O2 -shared -fPIC -o native/libxmmsr_fits.so native/fits_reader.cc \
    -lz -lpthread || true

# Persistent XLA compilation cache across container restarts (mount a
# volume here to keep production-size compiles warm; docs/PERFORMANCE.md).
ENV JAX_COMPILATION_CACHE_DIR=/app/.jit_cache

ENTRYPOINT ["xmmsr"]
CMD ["--help"]
