# TPU-host image for the sports-field-homography framework.
# (Twin of the reference's CUDA Dockerfile, targeting Cloud TPU VMs: the
# host needs only Python + ffmpeg; the TPU runtime comes from libtpu.)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg libgl1 libglib2.0-0 git && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml ./
COPY sports_field_homography_tpu ./sports_field_homography_tpu
COPY assets ./assets
COPY scripts ./scripts
# C++ PJRT serving runtimes (pjrt_serve: tensor-in/tensor-out artifact
# server; pjrt_predict: full frames->JSON pipeline, links OpenCV); build
# on hosts that serve exported artifacts natively (needs g++ + the PJRT
# C API header — see cpp/build.sh; not built here to keep the image slim)
COPY cpp ./cpp
COPY predict.py train.py test.py viz_preds.py bench.py ./

# On a TPU VM install jax[tpu]; elsewhere the CPU wheel is used.
RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir flax optax orbax-checkpoint pyyaml Pillow \
        opencv-python-headless tqdm tensorboardX

ENTRYPOINT ["/bin/bash"]
