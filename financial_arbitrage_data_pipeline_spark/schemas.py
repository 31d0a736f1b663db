"""Fixed table schemas for the engine.

The reference declares every schema by hand (dataclass field lists +
Postgres DDL; `database/models/influx.py:20-64`,
`database/models/postgres.py:377-544`). We do the same: fixed StructTypes,
no inference anywhere. SURVEY §1.3 is the derivation.

Type mapping (SURVEY §1.2): ns epochs → LongType; Kalshi cents →
IntegerType; Polymarket dollars → DoubleType; DECIMAL(15,6)/(10,2) money →
DecimalType; TIMESTAMP WITH TIME ZONE → TimestampType (session tz=UTC);
JSONB id-lists → ArrayType(StringType); JSON orderbook blob → StringType
parsed on demand with `from_json`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# market_snapshot — the time-series table.
#
# Reference: InfluxDB measurement with 2 tags (source, ticker) and the raw
# orderbook + 12-step ns timing chain as fields
# (`database/models/influx.py:37-63`). The 2-tag "minimal cardinality"
# design (`influx.py:5-11`) IS a partitioning scheme: we partition the
# Parquet table by (source, ticker) and Catalyst prunes on both.
# Event time `ts` = data_server_stored_ns (fallback now), `influx.py:142-143`.
# --------------------------------------------------------------------------

TIMING_CHAIN_NS = [
    "api_call_start_ns",
    "api_response_ns",
    "processing_complete_ns",
    "ireland_api_call_ns",
    "ireland_api_response_ns",
    "ireland_processing_complete_ns",
    "ireland_zeromq_sent_ns",
    "virginia_received_ns",
    "virginia_enriched_ns",
    "virginia_sent_to_data_server_ns",
    "data_server_received_ns",
    "data_server_stored_ns",
]

MARKET_SNAPSHOT = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("ticker", T.StringType(), False),
        T.StructField("full_orderbook", T.StringType(), True),
        *[T.StructField(f, T.LongType(), True) for f in TIMING_CHAIN_NS],
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Venue-specific orderbook JSON payload schemas, used with `from_json` on
# market_snapshot.full_orderbook (P11).
#
# Kalshi (`database/models/influx.py:330`, `etl/query.py:187-191`): levels
# are [price_cents, quantity] int pairs, price domain 1..99. Virginia
# serializes the whole raw dict so extra scalar keys ride along
# (`virginia/api/data_feed.py:272-280`, `virginia/coordinator.py:458`).
KALSHI_BOOK = T.StructType(
    [
        T.StructField("yes", T.ArrayType(T.ArrayType(T.IntegerType())), True),
        T.StructField("no", T.ArrayType(T.ArrayType(T.IntegerType())), True),
        T.StructField("ticker", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

# Polymarket nested-book form expected by the ETL reader
# (`etl/query.py:205-213`): bids/asks as {price, size} float-dollar structs.
PRICE_LEVEL = T.StructType(
    [
        T.StructField("price", T.DoubleType(), True),
        T.StructField("size", T.DoubleType(), True),
    ]
)
POLYMARKET_BOOK = T.StructType(
    [
        T.StructField(
            "orderbook",
            T.StructType(
                [
                    T.StructField("bids", T.ArrayType(PRICE_LEVEL), True),
                    T.StructField("asks", T.ArrayType(PRICE_LEVEL), True),
                ]
            ),
            True,
        ),
    ]
)

# Polymarket Virginia-snapshot flat form (`virginia/coordinator.py:499-517`).
POLYMARKET_FLAT = T.StructType(
    [
        T.StructField("condition_id", T.StringType(), True),
        T.StructField("yes_price", T.DoubleType(), True),
        T.StructField("no_price", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("liquidity", T.DoubleType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("timestamp", T.DoubleType(), True),
    ]
)

# --------------------------------------------------------------------------
# arb_pairs — runtime routing table (`virginia/database/read_from.py:32-41`).
# Small dimension; always broadcast in joins (J2).
# --------------------------------------------------------------------------
ARB_PAIRS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("kalshi_ticker", T.StringType(), False),
        T.StructField("polymarket_condition_id", T.StringType(), False),
        T.StructField("expiration_date", T.DateType(), True),
        T.StructField("pair_description", T.StringType(), True),
        T.StructField("is_active", T.BooleanType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# trade_tickets — 47 columns, DDL parity with
# `database/models/postgres.py:379-447`. analyzed_snapshot_ids is JSONB in
# the reference; here ArrayType(StringType) queried with array_contains
# (replacing the LIKE '%"id"%' hack at `database/postgres/writer.py:482-491`).
# --------------------------------------------------------------------------


def _dec(p: int, s: int) -> T.DecimalType:
    return T.DecimalType(p, s)


TRADE_TICKETS = T.StructType(
    [
        T.StructField("trade_id", T.StringType(), False),
        T.StructField("arbitrage_id", T.StringType(), False),
        # market identification
        T.StructField("kalshi_ticker", T.StringType(), False),
        T.StructField("polymarket_condition_id", T.StringType(), False),
        T.StructField("pair_id", T.StringType(), False),
        T.StructField("market_title", T.StringType(), True),
        # trade details
        T.StructField("venue", T.StringType(), False),  # kalshi|polymarket
        T.StructField("side", T.StringType(), False),  # buy|sell
        T.StructField("outcome", T.StringType(), False),  # YES|NO
        T.StructField("order_type", T.StringType(), True),  # default 'market'
        T.StructField("quantity", _dec(15, 6), False),
        T.StructField("limit_price", _dec(15, 6), True),
        # execution results
        T.StructField("status", T.StringType(), False),  # TradeStatus enum values
        T.StructField("executed_quantity", _dec(15, 6), True),
        T.StructField("executed_price", _dec(15, 6), True),
        T.StructField("average_fill_price", _dec(15, 6), True),
        T.StructField("total_cost", _dec(15, 6), True),
        T.StructField("fees", _dec(15, 6), True),
        T.StructField("external_order_id", T.StringType(), True),
        T.StructField("execution_report_id", T.StringType(), True),
        # arbitrage context
        T.StructField("arbitrage_type", T.StringType(), False),
        T.StructField("expected_profit", _dec(15, 6), True),
        T.StructField("expected_profit_bps", _dec(10, 2), True),
        T.StructField("leg_number", T.IntegerType(), True),
        T.StructField("related_trade_id", T.StringType(), True),
        # market data correlation
        T.StructField("analyzed_snapshot_ids", T.ArrayType(T.StringType()), True),
        T.StructField("executed_snapshot_id", T.StringType(), True),
        T.StructField("kalshi_bid_at_decision", _dec(15, 6), True),
        T.StructField("kalshi_ask_at_decision", _dec(15, 6), True),
        T.StructField("polymarket_bid_at_decision", _dec(15, 6), True),
        T.StructField("polymarket_ask_at_decision", _dec(15, 6), True),
        T.StructField("spread_at_decision", _dec(15, 6), True),
        # timing
        T.StructField("opportunity_detected_at", T.TimestampType(), True),
        T.StructField("decision_made_at", T.TimestampType(), True),
        T.StructField("order_submitted_at", T.TimestampType(), True),
        T.StructField("first_fill_at", T.TimestampType(), True),
        T.StructField("last_fill_at", T.TimestampType(), True),
        T.StructField("order_completed_at", T.TimestampType(), True),
        T.StructField("decision_latency_ms", _dec(10, 3), True),
        T.StructField("submission_latency_ms", _dec(10, 3), True),
        T.StructField("fill_latency_ms", _dec(10, 3), True),
        # risk and position
        T.StructField("position_size_before", _dec(15, 6), True),
        T.StructField("position_size_after", _dec(15, 6), True),
        T.StructField("portfolio_exposure_before", _dec(15, 6), True),
        T.StructField("portfolio_exposure_after", _dec(15, 6), True),
        T.StructField("risk_score", _dec(10, 4), True),
        # metadata
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("created_by", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

# Enum domains (`database/models/postgres.py:18-45`) — validated in tests.
TRADE_STATUS = [
    "pending",
    "submitted",
    "partially_filled",
    "filled",
    "cancelled",
    "rejected",
    "failed",
]
TRADE_SIDE = ["buy", "sell"]
TRADE_VENUE = ["kalshi", "polymarket"]
ARBITRAGE_TYPE = [
    "kalshi_yes_polymarket_no",
    "kalshi_no_polymarket_yes",
    "kalshi_polymarket_spread",
]

# --------------------------------------------------------------------------
# analysis_records — DDL parity with `database/models/postgres.py:460-496`.
# --------------------------------------------------------------------------
ANALYSIS_RECORDS = T.StructType(
    [
        T.StructField("analysis_id", T.StringType(), False),
        T.StructField("kalshi_ticker", T.StringType(), False),
        T.StructField("polymarket_condition_id", T.StringType(), False),
        T.StructField("pair_id", T.StringType(), False),
        T.StructField("arbitrage_type", T.StringType(), False),
        T.StructField("potential_profit", _dec(15, 6), True),
        T.StructField("potential_profit_bps", _dec(10, 2), True),
        T.StructField("rejection_reason", T.StringType(), False),
        T.StructField("rejection_details", T.StringType(), True),
        T.StructField("analyzed_snapshot_ids", T.ArrayType(T.StringType()), True),
        T.StructField("kalshi_bid", _dec(15, 6), True),
        T.StructField("kalshi_ask", _dec(15, 6), True),
        T.StructField("kalshi_bid_size", _dec(15, 6), True),
        T.StructField("kalshi_ask_size", _dec(15, 6), True),
        T.StructField("polymarket_bid", _dec(15, 6), True),
        T.StructField("polymarket_ask", _dec(15, 6), True),
        T.StructField("polymarket_bid_size", _dec(15, 6), True),
        T.StructField("polymarket_ask_size", _dec(15, 6), True),
        T.StructField("cross_market_spread", _dec(15, 6), True),
        T.StructField("required_minimum_spread", _dec(15, 6), True),
        T.StructField("analyzed_at", T.TimestampType(), True),
        T.StructField("analysis_duration_ms", _dec(10, 3), True),
        T.StructField("created_by", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# arbitrage_pairs — config + performance table, distinct from arb_pairs
# (`database/models/postgres.py:507-538`;
# UNIQUE(kalshi_ticker, polymarket_condition_id) enforced in tests).
# --------------------------------------------------------------------------
ARBITRAGE_PAIRS = T.StructType(
    [
        T.StructField("pair_id", T.StringType(), False),
        T.StructField("kalshi_ticker", T.StringType(), False),
        T.StructField("polymarket_condition_id", T.StringType(), False),
        T.StructField("market_title", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("is_active", T.BooleanType(), True),
        T.StructField("min_spread_bps", _dec(10, 2), True),
        T.StructField("max_position_size", _dec(15, 6), True),
        T.StructField("max_trade_size", _dec(15, 6), True),
        T.StructField("max_exposure", _dec(15, 6), True),
        T.StructField("stop_loss_bps", _dec(10, 2), True),
        T.StructField("total_trades", T.IntegerType(), True),
        T.StructField("total_volume", _dec(15, 6), True),
        T.StructField("total_profit", _dec(15, 6), True),
        T.StructField("win_rate", _dec(5, 4), True),
        T.StructField("average_profit_per_trade", _dec(15, 6), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("expiration_date", T.TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# Training-data pipeline tables (driver testdata; TESTDATA.md).
# --------------------------------------------------------------------------
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal asset table (engine-native; container has no codec libs, so
# payloads are opaque binary + typed metadata — see operators/multimodal.py).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
