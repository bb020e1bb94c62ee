"""CAIDA ITDK lookup family, re-expressed Spark-first.

The reference ships ~1k LoC of single-node machinery for using an ITDK
(Internet Topology Data Kit) dataset — router aliases, AS numbers and
geolocation keyed by ITDK node id:

- ItdkLookupPreprocessor (reference: events/grouping/graph/itdk/
  ItdkLookupPreprocessor.scala:44-201) inverts the ``.nodes`` file to
  (ip, node, asn) lines, shells out to ``sort -V``, and packs a 12-byte
  binary "aligned" file plus a JSON first-octet cumulative-distribution
  index;
- ItdkAliasLookup (ItdkAliasLookup.scala:54-221) binary-chops that
  aligned file per address with RandomAccessFile seeks;
- ItdkAsLookup / ItdkGeoLookup (ItdkAsLookup.scala:39-130,
  ItdkGeoLookup.scala:41-132) binary-chop the raw text files by node id;
- AliasResolver's ITDK mode (pruning/AliasResolver.scala:79-160) merges
  hosts whose addresses alias to the same ITDK node, the merged host
  taking uid "N<nodeId>" (impl/Host.scala:106-124).

All of that is the single-node HOW. The WHAT is relational: three text
formats parsed into DataFrames, one preprocessor join, and lookups that
are equi-joins. Spark-first shapes:

- parsing = ``spark.read.text`` + codegen string expressions (no UDFs);
- the preprocessor's sort + aligned file + CDF index = a left join on
  node id followed by ``repartitionByRange(ip).sortWithinPartitions``
  parquet: range partitioning IS the cumulative-distribution index
  (partition pruning replaces the first-octet guess) and parquet
  row-group min/max statistics ARE the binary chop;
- every get*By* = an equi-join against the lookup relation — at 10^12
  measurement rows the ITDK side stays a dimension (~10^7 rows), so
  Catalyst broadcasts it or AQE picks a shuffled hash join;
- AliasResolver ITDK mode = a (uid -> node) mapping join + one
  re-aggregation by the merged uid — no mutable mergedHosts map.

The sandbox has no ITDK dataset, so ``synth_itdk_*_lines`` derive
deterministic files-as-DataFrames from the synthetic traceroute hop
relation (operators/graph.py) with pure integer/string arithmetic; the
DuckDB oracles rebuild the same lines and re-parse them in SQL, so the
parsers themselves are cross-engine hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's recognized AS-attribution methods
# (ItdkAsNumber.scala:58-62). Lines whose method is not one of these
# parse with method=NULL and are NOT served by the AS lookup
# (ItdkAsLookup.scala:46-49 qualifiedEntries filter) — but the
# preprocessor's inverted map still uses their ASN
# (ItdkLookupPreprocessor.scala:64-76 reads the raw file unfiltered).
ITDK_AS_METHODS = ("interfaces", "refinement", "last_hop")


# ---------------------------------------------------------------------------
# Parsers: ITDK text lines -> relations (pure codegen expressions)
# ---------------------------------------------------------------------------


def parse_nodes_lines(lines: DataFrame) -> DataFrame:
    """``.nodes`` lines -> (node_id, address), one row per alias IP.

    Line format (ItdkLookupPreprocessor.scala:56-84):
    ``node N<id>:  ip1 ip2 ...`` (two spaces after the colon), with
    ``#`` comment lines dropped. The split-on-':  '/drop(6) parse is
    mirrored exactly."""
    return (
        lines.where(
            ~F.col("value").startswith("#")
            & F.col("value").startswith("node N")
        )
        .select(
            F.expr(
                "CAST(substring(split(value, ':  ')[0], 7) AS INT)"
            ).alias("node_id"),
            F.expr("split(split(value, ':  ')[1], ' ')").alias("__ips"),
        )
        .select("node_id", F.explode("__ips").alias("address"))
        .where(F.col("address") != "")
    )


def parse_as_lines(lines: DataFrame) -> DataFrame:
    """``.nodes.as`` lines -> (node_id, asn, method).

    Line format (ItdkAsNumber.scala:43-55): ``node.AS N<id> <asn>
    [method]``; method is kept only when it is a recognized enum name,
    else NULL (Try(withName).toOption)."""
    methods = ", ".join(f"'{m}'" for m in ITDK_AS_METHODS)
    return (
        lines.where(F.col("value").startswith("node.AS N"))
        .select(F.expr("split(value, ' ')").alias("p"))
        .select(
            F.expr("CAST(substring(p[1], 2) AS INT)").alias("node_id"),
            F.expr("CAST(p[2] AS INT)").alias("asn"),
            F.expr(
                f"CASE WHEN size(p) > 3 AND p[3] IN ({methods}) "
                "THEN p[3] END"
            ).alias("method"),
        )
    )


def parse_geo_lines(lines: DataFrame) -> DataFrame:
    """``.nodes.geo`` lines -> GeoInfo relation.

    Qualification mirrors ItdkGeoLookup.scala:62-65: the line starts
    with ``node.geo N`` and contains exactly 9 tabs. Field mapping and
    empty->NULL trimming mirror GeoInfo.scala:36-52; lat/lon are float
    (the reference stores Float)."""

    def _opt(i: int) -> str:
        return f"CASE WHEN trim(p[{i}]) = '' THEN NULL ELSE p[{i}] END"

    return (
        lines.where(
            F.col("value").startswith("node.geo N")
            & (
                F.expr("size(split(value, '\t'))") == 10
            )
        )
        .select(F.expr("split(value, '\t')").alias("p"))
        .select(
            F.expr(
                "CAST(substring(p[0], 11, length(p[0]) - 11) AS INT)"
            ).alias("node_id"),
            F.expr(_opt(1)).alias("continent"),
            F.expr(_opt(2)).alias("country"),
            F.expr(_opt(3)).alias("region"),
            F.expr(_opt(4)).alias("city"),
            F.expr("CAST(p[5] AS FLOAT)").alias("latitude"),
            F.expr("CAST(p[6] AS FLOAT)").alias("longitude"),
        )
    )


def read_itdk_nodes(spark: SparkSession, path: str) -> DataFrame:
    return parse_nodes_lines(spark.read.text(path))


def read_itdk_as(spark: SparkSession, path: str) -> DataFrame:
    return parse_as_lines(spark.read.text(path))


def read_itdk_geo(spark: SparkSession, path: str) -> DataFrame:
    return parse_geo_lines(spark.read.text(path))


# ---------------------------------------------------------------------------
# Preprocessor analogue
# ---------------------------------------------------------------------------


def itdk_inverted_map(nodes: DataFrame, as_df: DataFrame) -> DataFrame:
    """The preprocessor's inverted map: (address, node_id, asn).

    ItdkLookupPreprocessor.invertItdkNodeLookup performs a sorted-merge
    of the ``.nodes`` and ``.nodes.as`` files (both sorted by node id),
    taking the raw ASN regardless of method and defaulting to 0
    (AsNumberCategory.Unknown) when the node has no AS line
    (ItdkLookupPreprocessor.scala:60-76). Relationally that IS a left
    join with coalesce — no sort, no forward-only cursor."""
    asn = as_df.groupBy("node_id").agg(F.min("asn").alias("__asn"))
    return (
        nodes.join(asn, "node_id", "left")
        .select(
            "address",
            "node_id",
            F.coalesce("__asn", F.lit(0)).alias("asn"),
        )
    )


# sortable integer form of a dotted-quad IPv4 address; the lookup file
# ordering key (the reference's `sort -V` + 4-byte big-endian prefix)
_IP_LONG = (
    "CAST(split(address, '\\\\.')[0] AS BIGINT) * 16777216 + "
    "CAST(split(address, '\\\\.')[1] AS BIGINT) * 65536 + "
    "CAST(split(address, '\\\\.')[2] AS BIGINT) * 256 + "
    "CAST(split(address, '\\\\.')[3] AS BIGINT)"
)


def preprocess_itdk(
    spark: SparkSession,
    nodes_path: str,
    as_path: str,
    out_dir: str,
    n_partitions: int = 64,
) -> str:
    """ItdkLookupPreprocessor.preprocess, Spark-first: parse + invert +
    join, then write parquet range-partitioned and sorted by the
    numeric IP. The reference's aligned binary file + first-octet CDF
    index (ItdkLookupPreprocessor.scala:105-178) exists to make a
    single-node binary search cheap; range partitioning gives the same
    sublinear address probe distributed — partition pruning plays the
    role of the CDF index and parquet row-group min/max stats the
    binary chop. Returns ``out_dir``."""
    inv = itdk_inverted_map(
        read_itdk_nodes(spark, nodes_path), read_itdk_as(spark, as_path)
    ).withColumn("ip_long", F.expr(_IP_LONG))
    (
        inv.repartitionByRange(n_partitions, "ip_long")
        .sortWithinPartitions("ip_long")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_itdk_lookup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).select("address", "node_id", "asn")


# ---------------------------------------------------------------------------
# Lookups (equi-joins; the get*By* methods)
# ---------------------------------------------------------------------------


def lookup_by_address(addresses: DataFrame, inverted: DataFrame) -> DataFrame:
    """ItdkAliasLookup.getNodeFromAddress for a whole relation: left
    join on address — misses keep NULL node/asn (the reference returns
    None; ItdkAliasLookup.scala:185-203). ``addresses`` needs an
    ``address`` column; result adds (node_id, asn)."""
    return addresses.join(
        inverted.select("address", "node_id", "asn"), "address", "left"
    )


def as_by_node(nodes: DataFrame, as_df: DataFrame) -> DataFrame:
    """ItdkAsLookup.getAsNumberByNode as a join. Only method-qualified
    lines are served (ItdkAsLookup.scala:46-49): rows whose method
    parsed to NULL are invisible here even though the preprocessor's
    inverted map used their ASN. ``nodes`` needs a ``node_id`` column;
    result adds (asn, method) — NULL when absent/unqualified."""
    q = as_df.where(F.col("method").isNotNull())
    return nodes.join(q, "node_id", "left")


def geo_by_node(nodes: DataFrame, geo_df: DataFrame) -> DataFrame:
    """ItdkGeoLookup.getGeoInfoByNode as a join (left: misses -> NULL
    fields, mirroring the Option result)."""
    return nodes.join(geo_df, "node_id", "left")


# ---------------------------------------------------------------------------
# AliasResolver ITDK mode (pruning/AliasResolver.scala:79-160)
# ---------------------------------------------------------------------------


def itdk_contradictions(hops: DataFrame, inverted: DataFrame) -> DataFrame:
    """Hosts whose addresses map to MORE than one ITDK node — the case
    the reference refuses to handle (AliasResolver.scala:98-103 throws
    IllegalStateException 'Found multiple ITDK nodes for a single
    host'). Returned as a relation so a pipeline can assert emptiness
    up front instead of dying mid-fold."""
    return (
        hops.where(F.col("address").isNotNull())
        .select("uid", "address")
        .distinct()
        .join(inverted.select("address", "node_id"), "address")
        .groupBy("uid")
        .agg(F.countDistinct("node_id").alias("n_nodes"))
        .where(F.col("n_nodes") > 1)
    )


def resolve_aliases_itdk(hops: DataFrame, inverted: DataFrame) -> DataFrame:
    """The ITDK merge map: (uid, node_id, merged_uid). One row per host
    uid whose addresses alias to an ITDK node; merged_uid = 'N<node>'
    exactly as Host.uid does when itdkNodeId is set
    (impl/Host.scala:107-109). Hosts sharing a node thus relabel to the
    same uid and a downstream groupBy performs the mergeWith. On the
    contradiction case the reference throws; here min(node_id) wins
    deterministically — run ``itdk_contradictions`` first to assert
    there are none."""
    return (
        hops.where(F.col("address").isNotNull())
        .select("uid", "address")
        .distinct()
        .join(inverted.select("address", "node_id"), "address")
        .groupBy("uid")
        .agg(F.min("node_id").alias("node_id"))
        .select(
            "uid",
            "node_id",
            F.expr("concat('N', node_id)").alias("merged_uid"),
        )
    )


def itdk_vertices(hops: DataFrame, inverted: DataFrame) -> DataFrame:
    """Vertex relation after ITDK alias resolution: hops relabel to
    their merged uid and the naive groupBy-uid merge re-runs on the new
    key (Host.mergeWith set-union semantics, impl/Host.scala:222-259),
    carrying itdk_node_id and the preprocessor's node ASN. Hosts with
    no ITDK hit keep their original uid and NULL node fields.

    Shape: one dimension-sized mapping join (broadcastable — bounded by
    distinct hosts) + the same single-shuffle aggregation as
    topology_vertices."""
    from streamevmon_spark.operators.graph import _ASN_STR

    mapping = F.broadcast(resolve_aliases_itdk(hops, inverted))
    node_asn = F.broadcast(
        inverted.select("node_id", "asn").distinct()
    ).withColumnRenamed("asn", "itdk_asn")
    relabeled = (
        hops.join(mapping.select("uid", "node_id", "merged_uid"),
                  "uid", "left")
        .withColumn("new_uid", F.coalesce("merged_uid", "uid"))
    )
    asn_str = _ASN_STR.format(asn="asn")
    agg = (
        relabeled.groupBy(F.col("new_uid").alias("uid"))
        .agg(
            F.expr(
                "array_join(array_sort(collect_set(hostname)), ';')"
            ).alias("hostnames"),
            F.expr(
                "array_join(array_sort(collect_set(CASE WHEN address IS "
                f"NOT NULL THEN concat(address, ' (', {asn_str}, ')') "
                "END)), ';')"
            ).alias("addresses"),
            F.expr(
                "array_sort(collect_set(CASE WHEN asn > 0 THEN asn END))"
            ).alias("valid_asns"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_seen"),
            F.max("ts").alias("last_seen"),
            F.max("node_id").alias("itdk_node_id"),
        )
        .withColumn(
            "is_anonymous",
            F.expr("hostnames = '' AND addresses = ''"),
        )
    )
    return agg.join(
        node_asn, agg["itdk_node_id"] == node_asn["node_id"], "left"
    ).drop("node_id")


def itdk_merged_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Edge relation after ITDK alias resolution: endpoints relabel to
    'N<node>', self-loops drop, duplicates keep newest lastSeen and sum
    n_seen — identical semantics to the anonymous-merge application, so
    it reuses apply_merges (operators/graph.py:489)."""
    from streamevmon_spark.operators.graph import apply_merges

    return apply_merges(edges, mapping.select("uid", "merged_uid"))


# ---------------------------------------------------------------------------
# Deterministic synthetic ITDK dataset (cross-engine mirrored)
# ---------------------------------------------------------------------------
#
# Node grammar over the synthetic hop addresses (operators/graph.py):
#   10.1.<i>.<p>  (backbone)  -> node 100 + i   (path variants alias)
#   10.0.<s>.1    (source LAN) -> node 200 + s%6 (streams s, s+6 alias)
#   10.9.<s>.9    (dest)       -> absent from ITDK (lookup miss)
# AS lines exist for node % 7 != 3, asn = 64600 + node % 10; the method
# cycles interfaces/refinement/last_hop by node % 3, EXCEPT node % 11 = 5
# which gets an unrecognized method (exercises the parse-to-NULL + the
# preprocessor-vs-AsLookup asymmetry). Geo lines exist for node % 4 != 3;
# region is empty for node % 3 = 0 (exercises empty->NULL); lat/lon are
# exact binary fractions so float equality is cross-engine safe.

_NODE_OF_ADDRESS = (
    "CASE WHEN split(address, '\\\\.')[1] = '1' "
    "THEN 100 + CAST(split(address, '\\\\.')[2] AS INT) "
    "WHEN split(address, '\\\\.')[1] = '0' "
    "THEN 200 + CAST(split(address, '\\\\.')[2] AS INT) % 6 END"
)


def _synth_nodes(hops: DataFrame) -> DataFrame:
    """(node_id, address) pairs of the synthetic ITDK universe."""
    return (
        hops.where(F.col("address").isNotNull())
        .select("address")
        .distinct()
        .withColumn("node_id", F.expr(_NODE_OF_ADDRESS))
        .where(F.col("node_id").isNotNull())
        .select("node_id", "address")
    )


def synth_itdk_node_lines(hops: DataFrame) -> DataFrame:
    """The ``.nodes`` file as a one-column DataFrame of lines, in the
    exact CAIDA format the parser expects."""
    return _node_lines(_synth_nodes(hops))


def _node_lines(synth_nodes: DataFrame) -> DataFrame:
    return (
        synth_nodes
        .groupBy("node_id")
        .agg(
            F.expr(
                "array_join(array_sort(collect_set(address)), ' ')"
            ).alias("ips")
        )
        .select(
            F.expr("concat('node N', node_id, ':  ', ips)").alias("value")
        )
    )


def synth_itdk_as_lines(hops: DataFrame) -> DataFrame:
    """The ``.nodes.as`` file as lines."""
    return _as_lines(_synth_nodes(hops))


def _as_lines(synth_nodes: DataFrame) -> DataFrame:
    return (
        synth_nodes
        .select("node_id")
        .distinct()
        .where(F.expr("node_id % 7 != 3"))
        .select(
            F.expr(
                "concat('node.AS N', node_id, ' ', 64600 + node_id % 10, "
                "' ', CASE WHEN node_id % 11 = 5 THEN 'first_hop' "
                "WHEN node_id % 3 = 0 THEN 'interfaces' "
                "WHEN node_id % 3 = 1 THEN 'refinement' "
                "ELSE 'last_hop' END)"
            ).alias("value")
        )
    )


def synth_itdk_geo_lines(hops: DataFrame) -> DataFrame:
    """The ``.nodes.geo`` file as lines (10 tab-separated fields)."""
    return _geo_lines(_synth_nodes(hops))


def _geo_lines(synth_nodes: DataFrame) -> DataFrame:
    return (
        synth_nodes
        .select("node_id")
        .distinct()
        .where(F.expr("node_id % 4 != 3"))
        .select(
            F.expr(
                "concat('node.geo N', node_id, ':', '\t', "
                "element_at(array('NA','SA','OC'), node_id % 3 + 1), "
                "'\t', "
                "element_at(array('US','UY','NZ','AU'), node_id % 4 + 1), "
                "'\t', "
                "CASE WHEN node_id % 3 = 0 THEN '' "
                "ELSE concat('region-', node_id % 5) END, '\t', "
                "concat('city-', node_id), '\t', "
                "CAST(node_id % 180 - 90 + 0.5 AS STRING), '\t', "
                "CAST((node_id * 7) % 360 - 180 + 0.25 AS STRING), '\t', "
                "CAST(1000 + node_id AS STRING), '\t', '\t', 'ddec')"
            ).alias("value")
        )
    )


def synth_itdk(hops: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, as, geo) relations, produced by generating the three
    text files as line DataFrames and running the REAL parsers over
    them — the gate therefore hash-checks the parsing expressions, not
    just the downstream joins.

    The (node, address) base is materialized (localCheckpoint) before
    the lines are generated and parsed: it is node-dimension-sized, but
    without the barrier Catalyst pushes the parse predicates —
    functions of the group key — below the aggregation and evaluates
    the whole build-line/re-split expression tree once per HOP row
    instead of once per node (measured: 24 s -> sub-second for the
    as+geo join at sf0.1). Sharing the base also makes this one hop
    scan instead of three."""
    base = _synth_nodes(hops).localCheckpoint()
    return (
        parse_nodes_lines(_node_lines(base)),
        parse_as_lines(_as_lines(base)),
        parse_geo_lines(_geo_lines(base)),
    )
