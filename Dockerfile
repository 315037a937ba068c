# Container packaging for drop-in pipeline use — the analog of the
# reference's two per-engine images (src/two_group/Dockerfile,
# src/single_group/Dockerfile; pulled by every Nextflow module). One image
# serves both engines here because both are the same JAX package.
#
# CPU image by default. For TPU hosts, swap the pip line for
#   pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
# and run with --privileged on a TPU VM.

FROM python:3.12-slim

WORKDIR /opt/hygeia_tpu

COPY pyproject.toml README.md ./
COPY hygeia_tpu ./hygeia_tpu

RUN pip install --no-cache-dir "jax>=0.9" numpy pandas scipy optax \
    && pip install --no-cache-dir --no-deps .

# Verb-compatible entrypoint: `docker run <img> infer --help` etc., matching
# the reference's bin/hygeia dispatcher surface.
ENTRYPOINT ["python", "-m", "hygeia_tpu.cli"]
