# Test-image Dockerfile (counterpart of the reference's py.Dockerfile:
# same matrix pattern, CPU-jax instead of pygame/Xvfb — rendering here is
# array-native, so no virtual display is needed).
ARG PYTHON_VERSION
FROM python:$PYTHON_VERSION

SHELL ["/bin/bash", "-o", "pipefail", "-c"]

COPY . /usr/local/minigrid_tpu/
WORKDIR /usr/local/minigrid_tpu/

RUN pip install ".[rl,render,compat,wfc,graphs,checkpoint,testing]" --no-cache-dir

ENV JAX_PLATFORMS=cpu

ENTRYPOINT ["python", "-m", "pytest"]
CMD ["tests/", "-q"]
