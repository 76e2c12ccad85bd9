"""Import/export — mirrors the reference's examples/import_export_demo.rs:
JSON single-file round trip with id remapping, per-label CSV datasets,
JSONL at scale, and the seeded synthetic generators (S7-S15)."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark=None):
    import rust_graph_db_spark as rg
    from rust_graph_db_spark.io import (export_csv, export_json_file,
                                        export_jsonl, generate_graph,
                                        import_json)

    spark = spark or rg.get_spark("import_export_demo")
    base = tempfile.mkdtemp(prefix="rgds_io_demo_")

    # generate a seeded graph (same seed -> same graph on any cluster)
    g = generate_graph(spark, "tree", n=50, seed=11)
    lbl = g.vertex_labels[0]
    print(f"generated {g.vertex_frame(lbl).count()} vertices")

    # reference-format single-file JSON export -> fresh import (S7/S10)
    nv, ne = export_json_file(g, f"{base}/graph.json")
    print(f"exported {nv} vertices / {ne} edges")
    g2 = import_json(spark, f"{base}/graph.json")
    assert g2.vertex_frame(g2.vertex_labels[0]).count() == nv

    # per-label CSV and JSONL datasets (S8/S11, distributed)
    export_csv(g, f"{base}/csv")
    export_jsonl(g, f"{base}/jsonl")
    back = spark.read.json(f"{base}/jsonl/vertices/{lbl}")
    print("jsonl readback rows:", back.count())
    return back


if __name__ == "__main__":
    main()
