from .core import (
    avg_money,
    dec,
    money,
    ns_to_ts,
    ns_to_us,
    rate,
    sum_money,
)

__all__ = ["avg_money", "dec", "money", "ns_to_ts", "ns_to_us", "rate", "sum_money"]
