"""One pinned profiling level for the scaling investigation (dev tool).
Usage: taskset -c 0-(n-1) python prof_level.py <cores> <clips_path>"""

import sys
import tempfile
import time

from bench import bench_pipeline_config
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.session import get_spark


def main():
    cores, clips_path = int(sys.argv[1]), sys.argv[2]
    spark = get_spark(app_name=f"prof{cores}", cores=cores, shuffle_partitions=cores)
    clips = spark.read.parquet(clips_path)
    NearDupPipeline(
        spark, bench_pipeline_config(cores, f"w{cores}", checkpoint_stages=False),
        tempfile.mkdtemp(),
    ).run(clips.limit(2000))
    t0 = time.time()
    res = NearDupPipeline(
        spark, bench_pipeline_config(cores, f"m{cores}", checkpoint_stages=False),
        tempfile.mkdtemp(),
    ).run(clips)
    res.clusters.select("cluster_id").distinct().count()
    print(f"=== cores={cores} total {round(time.time() - t0, 1)}", flush=True)
    prev = 0.0
    for r in res.metrics.orderBy("elapsed_s").collect():
        print(f"  +{r.elapsed_s - prev:6.1f}  {r.stage:24s} out={r.rows_out}",
              flush=True)
        prev = r.elapsed_s
    spark.stop()


if __name__ == "__main__":
    main()
