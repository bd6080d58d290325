# Container image for easyrag_tpu (the reference ships a python-slim image
# with /data /models /app volumes and runs the batch CLI; same layout here,
# on a JAX/TPU base so jax[tpu] and libtpu are present).
#
# Build:  docker build -t easyrag-tpu .
# Run:    docker run --privileged \
#           -v $PWD/data:/data -v $PWD/models:/models easyrag-tpu
FROM python:3.10.14-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml /app/
COPY easyrag_tpu /app/easyrag_tpu
COPY native /app/native
COPY configs /app/configs
COPY bench.py /app/

# TPU runtime: jax[tpu] pulls libtpu from the official releases index
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir -e ".[models]"

VOLUME ["/data", "/models", "/app/outputs"]
ENV PYTHONUNBUFFERED=1

CMD ["python", "-m", "easyrag_tpu.cli", "--config", "configs/easyrag.yaml", \
     "--split", "test", "--qa-dir", "/data"]
