# Container packaging (role-equivalent of the reference's Dockerfile,
# which layers onto ocrd/core-cuda-tf1). This image targets TPU VMs:
# the base provides Python >= 3.10; jax[tpu] pulls libtpu for real
# chips and falls back to the CPU backend elsewhere.
FROM python:3.12-slim

ARG VCS_REF
ARG BUILD_DATE
LABEL \
    org.opencontainers.image.title="cor-asv-ann-tpu" \
    org.opencontainers.image.description="TPU-native sequence-to-sequence OCR post-correction (attention encoder-decoder), OCR-D processor suite" \
    org.opencontainers.image.revision=$VCS_REF \
    org.opencontainers.image.created=$BUILD_DATE

ENV PYTHONIOENCODING=utf8 \
    LANG=C.UTF-8 \
    LC_ALL=C.UTF-8 \
    # fixed system location for model resources (resolve_resource
    # searches here via CORASVANN_DATA; see wrapper/resources.py)
    CORASVANN_DATA=/usr/local/share/cor-asv-ann

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /build/cor-asv-ann-tpu
COPY . .

# jax[tpu] on TPU VMs; plain jax (CPU) elsewhere — pick at build time:
#   docker build --build-arg JAX_EXTRA=tpu .
ARG JAX_EXTRA=
RUN pip install --no-cache-dir \
        $( [ -n "$JAX_EXTRA" ] && echo "jax[$JAX_EXTRA]" || echo jax ) \
    && pip install --no-cache-dir . \
    && make native \
    && mkdir -p "$CORASVANN_DATA" \
    && cp testmodels/*.h5 "$CORASVANN_DATA"/

WORKDIR /data
VOLUME ["/data"]
CMD ["ocrd-cor-asv-ann-process", "--help"]
