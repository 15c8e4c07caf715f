package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) training splits (Bavarian et al. 2022,
  * arXiv:2207.14255): each document is cut into (prefix, middle, suffix)
  * at two deterministic pseudo-random boundaries, and a PSM/SPM ordering
  * flag decides the serialization — the data transform behind
  * infilling-capable code/text models.
  *
  * Everything is map-side codegen'd column arithmetic (md5-derived cut
  * fractions via [[Sampling.hashBucket]]'s conv-substring convention, so
  * the split is reproducible per document id on ANY engine — the same
  * determinism contract as the hash samplers). ZERO shuffles at any
  * corpus size.
  */
object Fim {

  private def cut(id: Column, salt: String, n: Column): Column =
    floor(n.cast("double") *
      Sampling.hashBucket(concat(id.cast("string"), lit(salt)), 1000).cast("double") /
      lit(1000.0)).cast("long")

  /** Split plan per document: (id, fim_mode 'psm'|'spm', p_len, m_len,
    * s_len, middle_md5). `spmPermille`‰ of documents get SPM ordering
    * (the paper trains a mix). Character-based cuts; `substring` is
    * 1-indexed on both engines.
    */
  def split(df: DataFrame, textCol: String, idCol: String,
      spmPermille: Int = 500): DataFrame = {
    require(spmPermille >= 0 && spmPermille <= 1000,
      s"spmPermille must be in [0,1000], got $spmPermille")
    val n = length(col(textCol)).cast("long")
    val c1 = cut(col(idCol), "|fim-c1", n)
    val c2 = cut(col(idCol), "|fim-c2", n)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.select(
      col(idCol),
      when(Sampling.hashBucket(concat(col(idCol).cast("string"), lit("|fim-m")), 1000)
        < spmPermille, lit("spm")).otherwise(lit("psm")).as("fim_mode"),
      lo.as("p_len"),
      (hi - lo).as("m_len"),
      (n - hi).as("s_len"),
      md5(col(textCol).substr((lo + 1).cast("int"), (hi - lo).cast("int")))
        .as("middle_md5"))
  }
}
