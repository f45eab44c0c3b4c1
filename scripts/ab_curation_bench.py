"""A/B attribution for the curation_v3 bench cell (VERDICT r5 Next #2):
time curation_v3 / curation / text_stats at sf0.1 in SEPARATE processes,
alternating the pre-sweep checkout (997a1f0, float quality score) and
HEAD (integer quality_micro), interleaved A,B,A,B,... so hypervisor-steal
drift hits both builds equally. Prints per-build best-of-N walls.

Usage: python scripts/ab_curation_bench.py [pairs]
Worker: python scripts/ab_curation_bench.py --worker <tree> <query>
"""
import json
import subprocess
import sys
import time

QUERIES = ["curation_v3", "curation", "text_stats"]
SF = "/root/testdata/sf0.1"
TREES = {"head": "/root/repo", "presweep": "/root/repo/.bench_presweep"}


def worker(tree: str, query: str) -> None:
    sys.path.insert(0, tree)
    from augmented_codebase_indexer_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name=f"ab-{query}", master="local[32]",
                      shuffle_partitions=32)
    qs = em.queries()
    # one warm pass to move JVM/codegen startup out of the measurement,
    # then two timed passes (the frozen best-of-2 method)
    qs[query](spark, SF).write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(2):
        t = time.monotonic()
        qs[query](spark, SF).write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t)
    print(json.dumps({"tree": tree, "query": query,
                      "wall": round(min(walls), 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3])
        return
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[tuple[str, str], list[float]] = {}
    for i in range(pairs):
        for name, tree in (("presweep", TREES["presweep"]),
                           ("head", TREES["head"])):
            for q in QUERIES:
                out = subprocess.run(
                    [sys.executable, __file__, "--worker", tree, q],
                    capture_output=True, text=True, cwd=tree, check=True,
                ).stdout.strip().splitlines()[-1]
                wall = json.loads(out)["wall"]
                results.setdefault((name, q), []).append(wall)
                print(f"pair {i} {name:9s} {q:12s} {wall:7.3f}s", flush=True)
    print()
    for q in QUERIES:
        a = min(results[("presweep", q)])
        b = min(results[("head", q)])
        print(f"{q:12s} presweep best {a:7.3f}s  head best {b:7.3f}s  "
              f"ratio {b / a:5.2f}x")


if __name__ == "__main__":
    main()
