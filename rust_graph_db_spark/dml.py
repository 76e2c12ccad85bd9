"""Write operators: CREATE / SET / DELETE / DETACH DELETE.

Reference semantics (SURVEY.md §2.9): CREATE requires labels and literal
properties; DELETE of a vertex with remaining edges is an error; DETACH
DELETE removes incident edges first; SET does read-modify-write on
(possibly nested) property paths and may reference current properties.

Spark-first design: mutations are COPY-ON-WRITE rebuilds of the per-label
DataFrames (union for insert, anti-join for delete, join+coalesce for
update). On real storage each of these maps 1:1 to a Delta Lake MERGE /
DELETE / APPEND — the dataflow below IS the MERGE body. Cross-table
atomicity (V+E in one CREATE pattern) follows the reference's ordering
discipline: vertices first on create, edges first on delete
(delete_executor.rs:109-129).

Per-row id allocation uses a reserved range + row_number, the same
batch-range strategy as the reference's bulk import
(rocksdb_store.rs:390-401). The global window inside one micro-batch of
creates is acceptable because DML batches are small relative to scans;
bulk ingest goes through ``model.next_locids`` range reservation +
``PropertyGraph.put_vertices``/``put_edges``, which allocate contiguous
id ranges per batch instead of a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_graph_db_spark.model import pack_graphid, unpack_locid
from rust_graph_db_spark.operators.ids import dense_ids, dense_index
from rust_graph_db_spark.parser.ast_nodes import (
    Create, Delete, Literal, MapLit, NodePattern, PathPattern, Prop,
    RelPattern, SetClause,
)


class CypherWriteError(ValueError):
    pass


def _lit_col(expr, params=None) -> F.Column:
    """Literal CREATE property value → Column. Nested map literals
    become STRUCT columns (reference §1.2: nested objects are real
    values, exercised by SET n.address.city —
    tests/test_set_nested_integration.rs); lists become ARRAYs;
    ``$name`` parameters resolve from ``params``."""
    from rust_graph_db_spark.parser.ast_nodes import ListLit, Param

    if isinstance(expr, Literal):
        return F.lit(expr.value)
    if isinstance(expr, Param):
        from rust_graph_db_spark.compiler import _param_lit
        if params is None or expr.name not in params:
            raise CypherWriteError(
                f"missing query parameter ${expr.name} — pass it via "
                "cypher(query, params={...})")
        return _param_lit(params[expr.name])[0]
    if isinstance(expr, MapLit):
        return F.struct(*[_lit_col(v, params).alias(k)
                          for k, v in expr.pairs])
    if isinstance(expr, ListLit):
        return F.array(*[_lit_col(v, params) for v in expr.items])
    raise CypherWriteError(
        "CREATE property maps accept literals only (reference "
        "match_executor.rs:360-367)")


def _literal_props(props, params=None) -> dict:
    """name → Column of literal (possibly nested) property values."""
    if props is None:
        return {}
    return {k: _lit_col(v, params) for k, v in props.pairs}


def _expr_props(ctx, props) -> dict:
    """name → Column for CREATE property maps. Literals always work
    (standalone CREATE — reference parity, match_executor.rs:360-367);
    when a pipeline is present, general expressions over its bindings
    are allowed too (engine extension — the created rows are built
    FROM the pipeline frame, so per-row values like ``{idx: i,
    parent: a.name}`` in MATCH-driven CREATE and FOREACH bodies are
    ordinary columns)."""
    if props is None:
        return {}
    from rust_graph_db_spark.compiler import compile_expr

    out = {}
    for k, v in props.pairs:
        try:
            out[k] = _lit_col(v, getattr(ctx, "params", None))
        except CypherWriteError:
            if ctx.df is None:
                raise
            c, _ = compile_expr(ctx, v)
            out[k] = c
    return out


def apply_create(ctx, clause: Create) -> None:
    """CREATE patterns — standalone or driven by matched rows."""
    from rust_graph_db_spark.compiler import Binding, _flat

    g = ctx.graph
    spark = ctx.spark
    n_vertices = n_edges = 0

    for pat in clause.patterns:
        items = pat.items
        # pass 1: create vertices for unbound node vars
        for idx in range(0, len(items), 2):
            node: NodePattern = items[idx]
            var = node.var
            if var is not None and var in ctx.env:
                continue  # bound: edge endpoint from the match df
            if node.label is None:
                raise CypherWriteError("CREATE node requires a label "
                                       "(create_executor.rs:113-131)")
            props = _expr_props(ctx, node.props)
            label = node.label
            labid = g.label_id(label)

            if ctx.df is None:
                base = g.next_locids(label, 1)
                new = spark.range(1).select(
                    pack_graphid(labid, F.lit(base)).alias("id"),
                    *[c.alias(k) for k, c in props.items()])
            else:
                # one partition-parallel dense numbering, pinned on
                # ctx.df so the entity rows and the per-row binding
                # below derive the SAME ids (the old double
                # global-Window both serialized on one task and
                # depended on two plans ordering identically)
                loc_col = f"_loc_{idx}"
                ctx.df, cnt = dense_ids(ctx.df, loc_col)
                base = g.next_locids(label, cnt)
                # one select against the pipeline frame: property
                # expressions (per-row values like {idx: i}) resolve
                # against its columns, which a narrowed id-only frame
                # would no longer carry
                new = ctx.df.select(
                    pack_graphid(labid,
                                 F.col(loc_col) + F.lit(base)).alias("id"),
                    *[v.alias(k) for k, v in props.items()])

            props_cols = [c for c in new.columns if c != "id"]
            new = new.select("id", *props_cols)
            if label in g._vertices:
                g._vertices[label] = g._vertices[label].unionByName(
                    new, allowMissingColumns=True).localCheckpoint(eager=True)
            else:
                g._vertices[label] = new.localCheckpoint(eager=True)
            n_vertices += 1 if ctx.df is None else new.count()

            # bind the var for edge pass / subsequent clauses
            if var is not None:
                if ctx.df is None:
                    cols = {c: _flat(var, c) for c in new.columns}
                    bound = new.select(*[F.col(c).alias(fc) for c, fc in cols.items()])
                    cols["label"] = _flat(var, "label")
                    bound = bound.withColumn(cols["label"], F.lit(label))
                    ctx.df = bound if ctx.df is None else ctx.df.crossJoin(bound)
                    ctx.env[var] = Binding("vertex", label, cols)
                else:
                    # per-row created vertex: same _loc column as the
                    # entity rows above, so ids line up by construction
                    ctx.df = ctx.df.withColumn(
                        _flat(var, "id"),
                        pack_graphid(labid, F.col(loc_col) + F.lit(base)))
                    cols = {"id": _flat(var, "id"), "label": _flat(var, "label")}
                    ctx.df = ctx.df.withColumn(cols["label"], F.lit(label))
                    for k, v in props.items():
                        fc = _flat(var, k)
                        ctx.df = ctx.df.withColumn(fc, v)
                        cols[k] = fc
                    ctx.env[var] = Binding("vertex", label, cols)

        # pass 2: create edges
        for idx in range(1, len(items), 2):
            rel: RelPattern = items[idx]
            left: NodePattern = items[idx - 1]
            right: NodePattern = items[idx + 1]
            if rel.direction == "both":
                raise CypherWriteError(
                    "CREATE requires a directed relationship "
                    "(create_executor.rs:80-85)")
            if rel.label is None:
                raise CypherWriteError("CREATE relationship requires a label")
            lvar, rvar = left.var, right.var
            if lvar is None or rvar is None or lvar not in ctx.env or rvar not in ctx.env:
                raise CypherWriteError("CREATE edge endpoints must be bound nodes")
            props = _expr_props(ctx, rel.props)
            elabel = rel.label
            labid = g.label_id(elabel)

            src_col = ctx.env[lvar].cols["id"]
            dst_col = ctx.env[rvar].cols["id"]
            if rel.direction == "in":
                src_col, dst_col = dst_col, src_col

            # One edge PER PIPELINE ROW (openCypher CREATE multiplicity
            # — duplicates are legitimate edges; MERGE is the dedup
            # form), with property expressions resolved against the
            # pipeline frame in the same select as the endpoints.
            rows = ctx.df.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
                *[v.alias(k) for k, v in props.items()])
            rows, cnt = dense_index(rows, ["src", "dst"], "_eloc")
            new = rows.withColumn(
                "id", pack_graphid(labid,
                                   F.col("_eloc")
                                   + F.lit(g.next_locids(elabel, cnt)))) \
                .drop("_eloc")
            new = new.select("id", "src", "dst",
                             *[c for c in new.columns if c not in ("id", "src", "dst")])
            if elabel in g._edges:
                g.set_edges(elabel, g._edges[elabel].unionByName(
                    new, allowMissingColumns=True).localCheckpoint(eager=True))
            else:
                g.set_edges(elabel, new.localCheckpoint(eager=True))
            n_edges += cnt

    ctx.write_stats["created_vertices"] = ctx.write_stats.get("created_vertices", 0) + n_vertices
    ctx.write_stats["created_edges"] = ctx.write_stats.get("created_edges", 0) + n_edges


def apply_merge(ctx, clause) -> None:
    """MERGE — engine extension (absent from the reference grammar,
    cypher.pest). Supported forms:

    - single-node ``MERGE (n:L {...})`` — standalone OR after a
      MATCH/WITH pipeline: bind when present, create otherwise, then
      ON MATCH / ON CREATE SET respectively. The property map is
      literal, so the pattern is row-independent: mid-query it merges
      ONCE and binds the result onto every pipeline row (the same node
      every row would merge in per-row Cypher semantics);
    - match-driven relationship ``MATCH ... MERGE (a)-[r:R {...}]->(b)``
      with both endpoints bound — create exactly the missing
      (src, dst, props) edges (anti-join dup check, the X1 follow
      dataflow at the Cypher level), never duplicating existing ones;
      ON CREATE SET applies to the created edges, ON MATCH SET to the
      pre-existing matched ones;
    - standalone whole-path ``MERGE (a:L1 {...})-[r:R {...}]->(b:L2
      {...})`` with UNBOUND labeled endpoints — match the ENTIRE
      pattern; when no full match exists, create the whole path (Cypher
      semantics: partial sub-pattern existence does not prevent
      creation), then ON CREATE / ON MATCH SET on the bound variables.

    The dataflow IS the storage-MERGE body: probe by the literal
    property map, branch on existence; on a Delta-backed deployment
    this maps to MERGE INTO WHEN MATCHED / WHEN NOT MATCHED."""
    from rust_graph_db_spark.compiler import _vertex_df
    from rust_graph_db_spark.parser.ast_nodes import Create, SetClause

    items = clause.pattern.items
    if len(items) == 3:
        left, _, right = items
        unbound = (left.var not in ctx.env if left.var else True) and \
                  (right.var not in ctx.env if right.var else True)
        if unbound and (left.label or right.label):
            return _merge_path(ctx, clause)
        return _merge_edge(ctx, clause)
    if len(items) != 1:
        raise CypherWriteError(
            "MERGE supports single-node or single-relationship patterns")
    node: NodePattern = items[0]
    if node.label is None:
        raise CypherWriteError("MERGE node requires a label")
    var = node.var
    if var is not None and var in ctx.env:
        raise CypherWriteError(
            "MERGE variable must be unbound (re-MERGE of a bound "
            "variable is a no-op match in Cypher; rename the variable)")
    props = _literal_props(node.props, ctx.params)
    outer = ctx.df     # mid-query MERGE: merge standalone, then attach
    if outer is not None and outer.limit(1).count() == 0:
        # Cypher executes MERGE once per pipeline row: zero rows means
        # zero executions — no node may be created as a side effect.
        # Downstream clauses still need the variable bound, so attach
        # an empty match of the right shape.
        flat, binding = _vertex_df(ctx, var or "_merge", node.label)
        ctx.df = outer.crossJoin(flat.limit(0))
        if var is not None:
            ctx.env[var] = binding
        return
    ctx.df = None

    g = ctx.graph
    n = 0
    if node.label in g._vertices:
        vf = g.vertex_frame(node.label)
        cond = F.lit(True)
        for k, c in props.items():
            cond = (cond & F.col(k).eqNullSafe(c)) if k in vf.columns \
                else F.lit(False)
        n = vf.where(cond).count()

    if n == 0:
        apply_create(ctx, Create((clause.pattern,)))
        if clause.on_create:
            apply_set(ctx, SetClause(tuple(clause.on_create)))
        ctx.write_stats["merge_created"] = \
            ctx.write_stats.get("merge_created", 0) + 1
    else:
        bind_var = var or "_merge"
        flat, binding = _vertex_df(ctx, bind_var, node.label)
        for k, c in props.items():
            flat = flat.where(F.col(binding.cols[k]).eqNullSafe(c))
        ctx.df = flat
        if var is not None:
            ctx.env[var] = binding
        if clause.on_match:
            apply_set(ctx, SetClause(tuple(clause.on_match)))
        ctx.write_stats["merge_matched"] = \
            ctx.write_stats.get("merge_matched", 0) + n
    if outer is not None:
        # attach the merged node to every pipeline row (row-count
        # semantics of per-row MERGE with a literal pattern)
        ctx.df = outer if ctx.df is None else outer.crossJoin(ctx.df)


def _merge_path(ctx, clause) -> None:
    """Standalone whole-path MERGE with unbound labeled endpoints:
    probe the FULL triple pattern through the read compiler; if at
    least one complete match exists, bind those rows (ON MATCH SET),
    else create the entire path via apply_create (ON CREATE SET) —
    per Cypher, an existing endpoint without the full pattern still
    means the whole path is created fresh."""
    from rust_graph_db_spark.compiler import _apply_match
    from rust_graph_db_spark.parser.ast_nodes import Create, Match, SetClause

    left, rel, right = clause.pattern.items
    if ctx.df is not None:
        raise CypherWriteError(
            "whole-path MERGE (unbound endpoints) is supported as a "
            "standalone (first) clause")
    if left.label is None or right.label is None or rel.label is None:
        raise CypherWriteError(
            "whole-path MERGE requires labels on both endpoints and "
            "the relationship")
    if rel.direction == "both":
        raise CypherWriteError("MERGE requires a directed relationship")

    probe = _Probe(ctx)
    have = (left.label in ctx.graph._vertices
            and right.label in ctx.graph._vertices
            and rel.label in ctx.graph._edges)
    if have:
        _apply_match(probe, Match((clause.pattern,)))
    if have and not probe.df.isEmpty():
        ctx.df, ctx.env = probe.df, probe.env
        if clause.on_match:
            apply_set(ctx, SetClause(tuple(clause.on_match)))
        ctx.write_stats["merge_matched"] = \
            ctx.write_stats.get("merge_matched", 0) + 1
    else:
        apply_create(ctx, Create((clause.pattern,)))
        # re-probe: the pattern now matches exactly the created path,
        # which binds EVERY pattern variable (incl. the relationship —
        # apply_create itself binds only nodes) for ON CREATE SET and
        # any following RETURN
        probe = _Probe(ctx)
        _apply_match(probe, Match((clause.pattern,)))
        ctx.df, ctx.env = probe.df, probe.env
        if clause.on_create:
            apply_set(ctx, SetClause(tuple(clause.on_create)))
        ctx.write_stats["merge_created"] = \
            ctx.write_stats.get("merge_created", 0) + 1


class _Probe:
    """Scratch compile context over the real ctx's graph — lets the
    pattern probe run from a clean slate (no df, no bindings) without
    disturbing the caller's state."""

    def __init__(self, ctx):
        self.graph = ctx.graph
        self.spark = ctx.spark
        self.df = None
        self.env = {}
        self._gensym = ctx._gensym
        self.write_stats = ctx.write_stats

    def sym(self, prefix: str = "_a") -> str:
        return f"{prefix}{next(self._gensym)}"


def _apply_set_on_edge_ids(ctx, elabel: str, ids_df, var: str,
                           items) -> None:
    """Run a SetClause against exactly the edge rows in ``ids_df``:
    binds ``var`` to a flat frame of those rows, then reuses apply_set's
    grouped read-modify-write (so nested paths / expressions over the
    edge's own properties work unchanged)."""
    from rust_graph_db_spark.compiler import Binding, _flat
    from rust_graph_db_spark.parser.ast_nodes import SetClause as _SC

    ef = ctx.graph.edge_frame(elabel)
    sel = ef.join(F.broadcast(ids_df), "id", "left_semi")
    cols = {c: _flat(var, c) for c in sel.columns}
    flat = sel.select(*[F.col(c).alias(fc) for c, fc in cols.items()])
    cols["label"] = _flat(var, "label")
    flat = flat.withColumn(cols["label"], F.lit(elabel))
    saved_df, saved_env = ctx.df, ctx.env
    ctx.df, ctx.env = flat, {var: Binding("edge", elabel, cols)}
    try:
        apply_set(ctx, _SC(tuple(items)))
    finally:
        ctx.df, ctx.env = saved_df, saved_env


def _merge_edge(ctx, clause) -> None:
    """Relationship MERGE with bound endpoints: dup-checked edge
    creation over the matched rows; ON CREATE SET runs against the
    edges this MERGE created, ON MATCH SET against the pre-existing
    matched ones (the two MERGE INTO arms)."""
    left, rel, right = clause.pattern.items
    if (clause.on_create or clause.on_match) and rel.var is None:
        raise CypherWriteError(
            "ON CREATE/ON MATCH SET on a relationship MERGE requires a "
            "relationship variable to target")
    if ctx.df is None or left.var not in ctx.env or right.var not in ctx.env:
        raise CypherWriteError(
            "relationship MERGE requires both endpoints bound by a MATCH")
    if rel.label is None:
        raise CypherWriteError("MERGE relationship requires a label")
    if rel.direction == "both":
        raise CypherWriteError("MERGE requires a directed relationship")
    if left.props or right.props or left.label or right.label:
        raise CypherWriteError(
            "relationship MERGE endpoints must be bare bound variables")
    props = _literal_props(rel.props, ctx.params)
    g = ctx.graph
    elabel = rel.label
    labid = g.label_id(elabel)

    src_col = ctx.env[left.var].cols["id"]
    dst_col = ctx.env[right.var].cols["id"]
    if rel.direction == "in":
        src_col, dst_col = dst_col, src_col
    pairs = ctx.df.select(F.col(src_col).alias("src"),
                          F.col(dst_col).alias("dst")).distinct()

    matched_ids = None
    if elabel in g._edges:
        ef = g._edges[elabel]
        cond = F.lit(True)
        for k, c in props.items():
            cond = (cond & F.col(k).eqNullSafe(c)) if k in ef.columns \
                else F.lit(False)
        hits = ef.where(cond)
        missing = pairs.join(hits.select("src", "dst"),
                             ["src", "dst"], "left_anti")
        if clause.on_match:
            # pin NOW: the frame mutates below when edges are created
            matched_ids = (hits.join(pairs, ["src", "dst"], "left_semi")
                           .select("id").localCheckpoint(eager=True))
    else:
        missing = pairs
    missing, cnt = dense_index(missing, ["src", "dst"], "_eloc")
    if cnt:
        base = g.next_locids(elabel, cnt)
        new = missing.withColumn(
            "id", pack_graphid(labid, F.col("_eloc") + F.lit(base))) \
            .drop("_eloc")
        for k, v in props.items():
            new = new.withColumn(k, v)
        new = new.select("id", "src", "dst",
                         *[c for c in new.columns
                           if c not in ("id", "src", "dst")])
        if elabel in g._edges:
            g.set_edges(elabel, g._edges[elabel].unionByName(
                new, allowMissingColumns=True).localCheckpoint(eager=True))
        else:
            g.set_edges(elabel, new.localCheckpoint(eager=True))
        if clause.on_create:
            _apply_set_on_edge_ids(ctx, elabel, new.select("id"),
                                   rel.var, clause.on_create)
    if clause.on_match and matched_ids is not None \
            and not matched_ids.isEmpty():
        _apply_set_on_edge_ids(ctx, elabel, matched_ids,
                               rel.var, clause.on_match)
    ctx.write_stats["merge_created_edges"] = \
        ctx.write_stats.get("merge_created_edges", 0) + cnt


def apply_set(ctx, clause: SetClause) -> None:
    """SET n.prop = expr / SET n.a.b = expr over the matched rows.

    Groups items per entity variable into ONE read-modify-write join
    (reference groups multiple SET items the same way,
    set_executor.rs:29-107).
    """
    from rust_graph_db_spark.compiler import compile_expr

    if ctx.df is None:
        raise CypherWriteError("SET requires a preceding MATCH")
    g = ctx.graph

    by_var: dict[str, list] = {}
    for item in clause.items:
        by_var.setdefault(item.target.base, []).append(item)
    replace = set(getattr(clause, "replace_vars", ()))
    for var in replace:          # SET n = {} clears ALL properties —
        by_var.setdefault(var, [])   # the var may carry zero items

    n_updated = 0
    for var, items in by_var.items():
        b = ctx.env.get(var)
        if b is None:
            raise CypherWriteError(f"unbound variable in SET: {var}")
        if b.label is None:
            raise CypherWriteError("SET target must have a known label")
        id_col = b.cols["id"]

        upd_cols = [F.col(id_col).alias("_uid")]
        names = []
        for i, item in enumerate(items):
            val, _ = compile_expr(ctx, item.value)
            name = f"_v{i}"
            upd_cols.append(val.alias(name))
            names.append((name, item.target.path))
        # Inside FOREACH the iterations are ordered and the LAST write
        # wins (openCypher); the compiler exposes the posexplode index
        # for exactly this. Outside FOREACH multiple rows writing one
        # entity have no defined order (first() keeps the reference's
        # arbitrary-row behavior).
        ordc = getattr(ctx, "foreach_ord", None)
        if ordc is not None:
            upd_cols.append(F.col(ordc).alias("_ord"))
            aggs = [F.max_by(n, "_ord").alias(n) for n, _ in names]
        else:
            aggs = [F.first(n).alias(n) for n, _ in names]
        if names:
            updates = ctx.df.select(*upd_cols).groupBy("_uid").agg(
                *aggs).withColumn("_m", F.lit(1))
        else:                        # SET n = {}: matched ids only
            updates = (ctx.df.select(F.col(id_col).alias("_uid"))
                       .distinct().withColumn("_m", F.lit(1)))

        if b.kind == "vertex":
            frame = g.vertex_frame(b.label)
        else:
            frame = g.edge_frame(b.label)
        joined = frame.join(F.broadcast(updates), frame["id"] == updates["_uid"], "left")

        for name, path in names:
            head = path[0]
            if len(path) == 1:
                if head in frame.columns:
                    newc = F.when(F.col("_m") == 1, F.col(name)).otherwise(F.col(head))
                else:
                    newc = F.when(F.col("_m") == 1, F.col(name))
                joined = joined.withColumn(head, newc)
            else:
                # nested path: parent struct must exist (reference
                # set_executor.rs:157-202)
                if head not in frame.columns:
                    raise CypherWriteError(f"nested SET parent {head!r} missing")
                nested = ".".join(path[1:])
                joined = joined.withColumn(
                    head,
                    F.when(F.col("_m") == 1,
                           F.col(head).withField(nested, F.col(name)))
                    .otherwise(F.col(head)))
        if var in replace:
            # SET n = {map}: clear every property column the map does
            # not name, on matched rows only (id/src/dst are identity,
            # not properties). Pure column expressions — same one-join
            # RMW plan as the per-key writes above.
            written = {p[0] for _, p in names}
            for colname in frame.columns:
                if colname in ("id", "src", "dst") or colname in written:
                    continue
                dt = frame.schema[colname].dataType
                joined = joined.withColumn(
                    colname,
                    F.when(F.col("_m") == 1, F.lit(None).cast(dt))
                     .otherwise(F.col(colname)))
        drop = ["_uid", "_m"] + [n for n, _ in names]
        result = joined.drop(*drop).localCheckpoint(eager=True)
        if b.kind == "vertex":
            g._vertices[b.label] = result
        else:
            g.set_edges(b.label, result)
        n_updated += updates.count()

    ctx.write_stats["updated"] = ctx.write_stats.get("updated", 0) + n_updated


def apply_delete(ctx, clause: Delete) -> None:
    """DELETE / DETACH DELETE bound variables.

    Vertex delete with remaining incident edges is an error unless DETACH
    (reference delete_executor.rs:99-103); DETACH removes incident edges
    in both directions first (delete_executor.rs:109-129).
    """
    if ctx.df is None:
        raise CypherWriteError("DELETE requires a preceding MATCH")
    g = ctx.graph
    n_deleted = 0

    for var in clause.vars:
        b = ctx.env.get(var)
        if b is None:
            raise CypherWriteError(f"unbound variable in DELETE: {var}")
        ids = ctx.df.select(F.col(b.cols["id"]).alias("id")).distinct() \
                    .localCheckpoint(eager=True)

        if b.kind == "edge":
            labels = [b.label] if b.label else list(g._edges)
            for lb in labels:
                g.pin_counter(lb)   # deleted edge ids must never be reused
                g.set_edges(lb, g.edge_frame(lb).join(
                    F.broadcast(ids), "id", "left_anti").localCheckpoint(eager=True))
            n_deleted += ids.count()
            continue

        labels = [b.label] if b.label else list(g._vertices)
        if clause.detach:
            for lb in list(g._edges):
                e = g.edge_frame(lb)
                g.pin_counter(lb)
                g.set_edges(lb, e.join(
                    F.broadcast(ids.select(F.col("id").alias("src"))), "src", "left_anti"
                ).join(
                    F.broadcast(ids.select(F.col("id").alias("dst"))), "dst", "left_anti"
                ).localCheckpoint(eager=True))
        else:
            for lb in list(g._edges):
                e = g.edge_frame(lb)
                touching = e.join(
                    F.broadcast(ids),
                    (e["src"] == ids["id"]) | (e["dst"] == ids["id"])).limit(1)
                if not touching.isEmpty():
                    raise CypherWriteError(
                        f"cannot delete vertex with edges (label {lb}); "
                        "use DETACH DELETE (delete_executor.rs:99-103)")
        for lb in labels:
            g.pin_counter(lb)   # deleted vertex ids must never be reused
            g._vertices[lb] = g.vertex_frame(lb).join(
                F.broadcast(ids), "id", "left_anti").localCheckpoint(eager=True)
        n_deleted += ids.count()

    ctx.write_stats["deleted"] = ctx.write_stats.get("deleted", 0) + n_deleted
