"""Enrichment dimension joins (SURVEY.md §2.1 S4-S7, §2.3 J3-J4).

The reference's per-domain network calls (WHOIS :593-739, DNS+ASN
:741-814, SSL :816-841, geolocation :843-883) become left joins against
snapshot dimension tables, all broadcast (small dims vs the batch):

- WHOIS only applies to naive main domains (domain_collector.py:453-458,
  naive last-2-labels :226-232); subdomains copy created/expiry/registrar
  from the main domain's NODE row — visible state at item time, i.e. the
  parent's values if the parent was processed at an earlier claim rank in
  this batch, else the parent node from previous iterations (J3);
- DNS parent-NS fallback: coalesce(own NS, main-domain NS) (J4);
- SSL: missing row = handshake failure → ssl_valid=false (:839-841);
- geolocation: ip from the dns snapshot, then geo-by-ip (:843-856).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.classify import normalize_date


def _naive_main(domain: F.Column) -> F.Column:
    """Last-2-labels main domain (domain_collector.py:226-232)."""
    parts = F.split(domain, r"\.")
    return F.when(F.size(parts) > 2,
                  F.concat_ws(".", F.slice(parts, -2, 2))).otherwise(domain)


def enrich_batch(batch: DataFrame, whois: DataFrame, dns: DataFrame,
                 ssl: DataFrame, geo: DataFrame,
                 prior_nodes: DataFrame) -> DataFrame:
    """batch: (domain_name, batch_rank, ...) — adds the enrichment columns.

    prior_nodes supplies the whois-copy source for subdomains whose main
    domain is NOT in this batch at an earlier rank.
    """
    df = batch.withColumn("main_domain", _naive_main(F.col("domain_name")))

    # --- WHOIS for main domains
    w = whois.select(
        F.col("domain").alias("main_domain"),
        normalize_date(F.col("created_date_raw")).alias("_w_created"),
        normalize_date(F.col("expiry_date_raw")).alias("_w_expiry"),
        F.col("registrar").alias("_w_registrar"))
    df = df.join(F.broadcast(w), "main_domain", "left")

    # whois-copy for subdomains: parent processed earlier in this batch …
    batch_parents = df.filter(F.col("domain_name") == F.col("main_domain")) \
        .select(F.col("domain_name").alias("main_domain"),
                F.col("batch_rank").alias("_p_rank"),
                F.col("_w_created").alias("_bp_created"),
                F.col("_w_expiry").alias("_bp_expiry"),
                F.col("_w_registrar").alias("_bp_registrar"))
    # … else the parent node from previous iterations
    prior_parents = prior_nodes.select(
        F.col("domain_name").alias("main_domain"),
        F.col("created_date").alias("_pp_created"),
        F.col("expiry_date").alias("_pp_expiry"),
        F.col("registrar").alias("_pp_registrar"))
    is_main = F.col("domain_name") == F.col("main_domain")
    df = (df
          .join(F.broadcast(batch_parents), "main_domain", "left")
          .join(F.broadcast(prior_parents), "main_domain", "left")
          .withColumn("_bp_visible",
                      F.col("_p_rank").isNotNull()
                      & (F.col("_p_rank") < F.col("batch_rank")))
          .withColumn("created_date",
                      F.when(is_main, F.col("_w_created"))
                      .when(F.col("_bp_visible"), F.col("_bp_created"))
                      .otherwise(F.col("_pp_created")))
          .withColumn("expiry_date",
                      F.when(is_main, F.col("_w_expiry"))
                      .when(F.col("_bp_visible"), F.col("_bp_expiry"))
                      .otherwise(F.col("_pp_expiry")))
          .withColumn("registrar",
                      F.when(is_main, F.col("_w_registrar"))
                      .when(F.col("_bp_visible"), F.col("_bp_registrar"))
                      .otherwise(F.col("_pp_registrar"))))

    # --- DNS + parent-NS fallback + ASN
    d_own = dns.select(F.col("domain").alias("domain_name"),
                       F.col("nameservers").alias("_ns_own"),
                       F.col("ip_address").alias("ip_address"),
                       F.col("asn"), F.col("asn_description"))
    d_parent = dns.select(F.col("domain").alias("main_domain"),
                          F.col("nameservers").alias("_ns_parent"))
    df = (df
          .join(F.broadcast(d_own), "domain_name", "left")
          .join(F.broadcast(d_parent), "main_domain", "left")
          .withColumn("nameservers",
                      F.when(F.col("_ns_own").isNotNull(), F.col("_ns_own"))
                      .when(~is_main, F.col("_ns_parent"))
                      .otherwise(F.lit(None))))

    # --- SSL: missing row == failed handshake → ssl_valid false
    s = ssl.select(F.col("domain").alias("domain_name"),
                   F.col("ssl_valid").alias("_ssl_valid"),
                   F.col("ssl_expiry").alias("ssl_expiry"))
    df = (df.join(F.broadcast(s), "domain_name", "left")
          .withColumn("ssl_valid", F.coalesce(F.col("_ssl_valid"), F.lit(False))))

    # --- geolocation by the dns-resolved ip
    g = geo.select(F.col("ip_address"),
                   F.col("latitude"), F.col("longitude"), F.col("country"))
    df = df.join(F.broadcast(g), "ip_address", "left")

    return df.drop("_w_created", "_w_expiry", "_w_registrar", "_p_rank",
                   "_bp_created", "_bp_expiry", "_bp_registrar",
                   "_pp_created", "_pp_expiry", "_pp_registrar",
                   "_bp_visible", "_ns_own", "_ns_parent", "_ssl_valid")
