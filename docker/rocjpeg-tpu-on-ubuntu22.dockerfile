# rocjpeg_tpu on Ubuntu 22.04 for Cloud TPU VMs.
#
# The reference ships OS-image dockerfiles that install the GPU driver stack
# plus the rocjpeg packages (docker/rocJPEG-on-ubuntu22.dockerfile). The TPU
# analog installs the JAX TPU runtime (libtpu comes with jax[tpu]; the TPU
# driver lives on the host VM and is reached through /dev/vfio + the TPU
# runtime, so no kernel bits are needed in the container) and then builds
# and installs the rocjpeg_tpu wheel from source.
#
# Build:   docker build -f docker/rocjpeg-tpu-on-ubuntu22.dockerfile -t rocjpeg-tpu .
# Run on a TPU VM (needs privileged device access):
#   docker run --privileged --net=host -v /dev:/dev rocjpeg-tpu \
#     python -m rocjpeg_tpu.tools.jpegdecode -i /images -fmt rgb

FROM ubuntu:22.04

RUN apt-get update -y && DEBIAN_FRONTEND=noninteractive apt-get -y install \
    g++ make cmake pkg-config git python3 python3-dev python3-pip python3-venv \
    && rm -rf /var/lib/apt/lists/*

# JAX with the TPU runtime (pulls libtpu from the libtpu-releases index).
RUN python3 -m pip install --no-cache-dir -U pip && \
    python3 -m pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    python3 -m pip install --no-cache-dir numpy pytest build

WORKDIR /workspace/rocjpeg_tpu
COPY . .

# Native host library (entropy front-end + C ABI) + the Python wheel.
RUN make native capi && \
    python3 -m build --wheel && \
    python3 -m pip install --no-cache-dir dist/*.whl

# Smoke: import and print the version + device inventory at container start.
CMD ["python3", "-c", "import rocjpeg_tpu, jax; print('rocjpeg_tpu', rocjpeg_tpu.__version__, '--', jax.devices())"]
