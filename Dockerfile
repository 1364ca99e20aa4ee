# Container for arriba_tpu: STAR + samtools + the framework.
FROM ubuntu:noble

RUN apt-get update -y && \
    apt-get install -y --no-install-recommends \
        python3 python3-pip python3-dev g++ make zlib1g-dev wget samtools \
        rna-star && \
    rm -rf /var/lib/apt/lists/*

COPY . /arriba_tpu
WORKDIR /arriba_tpu

RUN pip3 install --break-system-packages --no-cache-dir \
        numpy "jax[cpu]" matplotlib && \
    ./native/build.sh

ENV PYTHONPATH=/arriba_tpu

ENTRYPOINT ["/bin/bash", "-c"]
CMD ["cd /output && /arriba_tpu/run_arriba_tpu.sh /references/STAR_index_* /references/*.gtf /references/*.fa /arriba_tpu/database/blacklist*.tsv.gz /arriba_tpu/database/known_fusions*.tsv.gz /arriba_tpu/database/protein_domains*.gff3 $THREADS /read1.fastq.gz $(ls /read2.fastq.gz 2> /dev/null)"]
