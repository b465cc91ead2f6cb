# mslesions3d_tpu runtime image (component C28 analog; the reference ships a
# CUDA torch image, lesions3d/dockerfile — this framework targets TPU VMs
# where jax[tpu] talks to libtpu directly).
FROM python:3.12-slim

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax numpy scipy scikit-learn pandas matplotlib seaborn tensorboardX

WORKDIR /app
COPY mslesions3d_tpu/ mslesions3d_tpu/
COPY bench.py __graft_entry__.py README.md ./

ENV PYTHONPATH=/app
ENTRYPOINT ["python", "-m", "mslesions3d_tpu.cli.train"]
