"""Sinks — D1-D6: filesystem, dynamic-DDL database, review queue,
file-history ledger, error-row union (in operators), notification outbox.
"""
