package graft.cnpj

import org.apache.spark.sql.types._

/** Explicit schemas for the 10 CNPJ tables.
  *
  * Column names mirror the reference's injected headerless-CSV names
  * (`lambdas/fetch_data/fetch_data.py:18-46`); types are pinned to what
  * the reference lake ends up with after pyarrow inference + Glue crawler
  * (captured fixture `lambdas/check_update/check_update.py:154-183`:
  * codes/keys bigint, names string, cap_soc double). Declaring them —
  * instead of re-inferring per file — removes the reference's inference
  * drift and lets bad upstream data fail loudly (FAILFAST read).
  *
  * `dt_*` columns stay yyyymmdd integers (as inferred in the reference
  * lake); date-typed views are exposed by CnpjViews.
  */
object Schemas {

  val AllowedTableNames: Seq[String] = Seq(
    "cnaes", "empresas", "estabelecimentos", "motivos",
    "municipios", "naturezas", "paises", "qualificacoes",
    "simples", "socios")

  private def dim = StructType(Seq(
    StructField("codigo", LongType),
    StructField("desc", StringType)))

  val schemas: Map[String, StructType] = Map(
    "empresas" -> StructType(Seq(
      StructField("cnpj_raiz", LongType),
      StructField("raz_soc", StringType),
      StructField("nat_jud", LongType),
      StructField("qualif_resp", LongType),
      StructField("cap_soc", DoubleType), // decimal-comma in source CSV
      StructField("porte", LongType),
      StructField("ent_fed", StringType))),
    "municipios" -> dim,
    "cnaes" -> dim,
    "naturezas" -> dim,
    "qualificacoes" -> dim,
    "paises" -> dim,
    "motivos" -> dim,
    "socios" -> StructType(Seq(
      StructField("cnpj_raiz", LongType),
      StructField("tpes_soc", LongType),
      StructField("nome_soc", StringType),
      StructField("cpf_cnpj_soc", StringType),
      StructField("cod_qualif_soc", LongType),
      StructField("dt_entrada", LongType),
      StructField("cod_pais", LongType),
      StructField("cpf_rep_legal", StringType),
      StructField("nome_rep_legal", StringType),
      StructField("cod_qualif_rep", LongType),
      StructField("fx_etaria_soc", LongType))),
    "simples" -> StructType(Seq(
      StructField("cnpj_raiz", LongType),
      StructField("opcao_simpl", StringType),
      StructField("dt_opcao_simpl", LongType),
      StructField("dt_exclusao_simpl", LongType),
      StructField("opcao_mei", StringType),
      StructField("dt_opcao_mei", LongType),
      StructField("dt_exclusao_mei", LongType))),
    "estabelecimentos" -> StructType(Seq(
      StructField("cnpj_raiz", LongType),
      StructField("filial", LongType),
      StructField("dv", LongType),
      StructField("cod_id_tipo", LongType),
      StructField("nome_fant", StringType),
      StructField("cod_sit_cad", LongType),
      StructField("dt_ref_sit_cad", LongType),
      StructField("cod_mot_sit_cad", LongType),
      StructField("nom_cidade_ext", StringType),
      StructField("cod_pais", LongType),
      StructField("dt_abrt", LongType),
      StructField("cnae_pri", LongType),
      StructField("cnae_sec", StringType),
      StructField("end_tipo", StringType),
      StructField("end_desc", StringType),
      StructField("end_num", StringType),
      StructField("end_compl", StringType),
      StructField("end_bairro", StringType),
      StructField("end_cep", StringType),
      StructField("end_uf", StringType),
      StructField("end_cod_muni", LongType),
      StructField("ddd1", StringType),
      StructField("tel1", StringType),
      StructField("ddd2", StringType),
      StructField("tel2", StringType),
      StructField("ddd_fax", StringType),
      StructField("fax", StringType),
      StructField("email", StringType),
      StructField("sit_espec", StringType),
      StructField("dt_sit_espec", LongType))))

  def apply(table: String): StructType = schemas(table)
}
