"""Explicit StructType schemas for every table the engine reads.

The reference declares no schema anywhere — every dtype is inferred
by pandas read_* (SURVEY.md §1, e.g. matriz_movilidad.ipynb:122 and
temperaturas_rm.py:121-122 patch inference failures with astype).
Declared schemas are this engine's first upgrade: scans validate
against them, Catalyst prunes to exactly the declared columns, and a
drifted upstream file fails fast instead of silently changing types.

Two families:
- STAR: the driver-generated TPC-H-ish tables under /root/testdata
  (TESTDATA.md / FIXTURES.md §9) that declared queries run on.
- Reference-shaped fixtures (FIXTURES.md §1-§8) used by the
  characterization tests of the reference-specific semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------- STAR

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

STAR: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------- reference fixtures
# FIXTURES.md §1-§8; schemas distilled from the reference's real
# inputs (atenciones_urgencia.py:13-26, temperaturas_rm.py:40-96,
# matriz_movilidad.ipynb cells 4-20).

ATENCIONES_URGENCIAS = T.StructType(
    [
        T.StructField("RegionCodigo", T.StringType()),
        T.StructField("RegionGlosa", T.StringType()),
        T.StructField("ComunaGlosa", T.StringType()),
        T.StructField("ServicioSaludGlosa", T.StringType()),
        T.StructField("TipoUrgencia", T.StringType()),
        T.StructField("NivelComplejidad", T.StringType()),
        T.StructField("Anio", T.IntegerType()),
        T.StructField("SemanaEstadistica", T.IntegerType()),
        T.StructField("Causa", T.StringType()),
        T.StructField("NumTotal", T.LongType()),
        T.StructField("NumMenor1Anio", T.LongType()),
        T.StructField("Num1a4Anios", T.LongType()),
        T.StructField("Num5a14Anios", T.LongType()),
        T.StructField("Num15a64Anios", T.LongType()),
        T.StructField("Num65oMas", T.LongType()),
    ]
)

EDUCACION = T.StructType(
    [
        T.StructField("comuna", T.StringType()),
        T.StructField("ano", T.IntegerType()),
        T.StructField("matriculas", T.LongType()),
        T.StructField("tipo", T.StringType()),
    ]
)

ESTACIONES = T.StructType(
    [
        T.StructField("Nombre_Estacion", T.StringType()),
        T.StructField("Latitud", T.DoubleType()),
        T.StructField("Longitud", T.DoubleType()),
        T.StructField("Codigo_Estacion", T.StringType()),
        T.StructField("Region", T.IntegerType()),
    ]
)

TEMPERATURAS = T.StructType(
    [
        T.StructField("Fecha", T.DateType()),
        T.StructField("Temperatura_Media", T.DoubleType()),
        T.StructField("Nombre_Estacion", T.StringType()),
        T.StructField("Codigo_Estacion", T.StringType()),
        T.StructField("Latitud", T.DoubleType()),
        T.StructField("Longitud", T.DoubleType()),
        T.StructField("Region", T.IntegerType()),
    ]
)

COMUNAS = T.StructType(
    [
        T.StructField("objectid", T.LongType()),
        T.StructField("cod_comuna", T.IntegerType()),
        T.StructField("codregion", T.IntegerType()),
        T.StructField("Region", T.StringType()),
        T.StructField("Comuna", T.StringType()),
        T.StructField("Provincia", T.StringType()),
        T.StructField("lat_centroid", T.DoubleType()),
        T.StructField("lon_centroid", T.DoubleType()),
    ]
)
