# Container image for the flusher_spark engine (reference TODO.md:4's
# Dockerfile, re-expressed for a Spark deployment). The image is
# driver-shaped: it runs the CLI / scheduler locally by default and submits
# to a cluster when SPARK_MASTER points at one.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/local/bin/python

# Engine dependencies only — everything else is stdlib. Versions track the
# sandbox this repo is developed and tested in.
RUN pip3 install --no-cache-dir \
    "pyspark==4.1.2" pyarrow pandas numpy

WORKDIR /opt/flusher-spark
COPY flusher_spark/ flusher_spark/
COPY bin/ bin/
COPY bench.py __spark_entry__.py ./

ENV PYTHONPATH=/opt/flusher-spark
ENTRYPOINT ["bin/flusher-spark"]
CMD ["list"]
