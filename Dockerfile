# nkbx TPU-host image — the TPU analog of the reference's pinned CUDA
# environment (reference Dockerfile:1-112 pins CUDA 11.8 / cuDNN8 /
# TensorRT 8.6.1.6 / torch 2.1). Build on a Cloud TPU VM (v5e/v6e): libtpu
# comes from the jax[tpu] wheel; no driver installs needed in-container
# beyond /dev/accel* passthrough (use --privileged or the TPU device flags).

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg62-turbo-dev libpng-dev \
        libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/nkbx
COPY requirements-lock.txt .
RUN pip install --no-cache-dir -r requirements-lock.txt \
    && pip install --no-cache-dir "jax[tpu]==0.9.0" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
# native decode pool (ctypes .so; loader falls back to cv2 if absent)
RUN make -C nkbx/native

ENV PYTHONPATH=/opt/nkbx
ENTRYPOINT ["python"]
CMD ["train.py", "--help"]
