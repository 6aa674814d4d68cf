package graft.gen

/** Embedded Turkish-locale lexicons.
  *
  * The reference leans on the Faker `tr_TR` locale (run_engine.py:45);
  * no such library exists for Scala and the build is offline
  * (SURVEY.md §7.4), so the engine ships small embedded lists. Values
  * are common public Turkish names/places/words — the semantic contract
  * is "plausible Turkish-locale token", not any specific corpus.
  */
object Lexicons {
  val FirstNames: Seq[String] = Seq(
    "Ahmet", "Mehmet", "Ayşe", "Fatma", "Ali", "Emre", "Elif", "Zeynep",
    "Mustafa", "Hasan", "Hüseyin", "Murat", "Deniz", "Cem", "Selin",
    "Burak", "Gül", "Kemal", "Osman", "Yusuf")

  val LastNames: Seq[String] = Seq(
    "Yılmaz", "Kaya", "Demir", "Şahin", "Çelik", "Yıldız", "Yıldırım",
    "Öztürk", "Aydın", "Arslan", "Doğan", "Kılıç", "Aslan", "Çetin",
    "Kara", "Koç", "Kurt", "Özdemir", "Polat", "Erdoğan")

  val Cities: Seq[String] = Seq(
    "İstanbul", "Ankara", "İzmir", "Bursa", "Antalya", "Adana", "Konya",
    "Gaziantep", "Mersin", "Kayseri", "Eskişehir", "Samsun", "Denizli",
    "Trabzon", "Erzurum", "Malatya", "Van", "Sivas", "Aydın", "Muğla")

  val Countries: Seq[String] = Seq(
    "Türkiye", "Almanya", "Fransa", "İtalya", "İspanya", "Hollanda",
    "Belçika", "Avusturya", "İngiltere", "Azerbaycan")

  val CompanyNames: Seq[String] = Seq(
    "Anadolu", "Marmara", "Ege", "Karadeniz", "Akdeniz", "Boğaziçi",
    "Toros", "Kapadokya", "Pamukkale", "Ararat", "Likya", "İyonya")

  val CompanySuffixes: Seq[String] = Seq(
    "A.Ş.", "Ltd. Şti.", "Holding", "Ticaret A.Ş.", "Sanayi ve Ticaret Ltd. Şti.")

  /** Sentence/word pool (ERP-flavored Turkish nouns, lorem-style). */
  val Words: Seq[String] = Seq(
    "veri", "sistem", "kayıt", "belge", "fatura", "müşteri", "sipariş",
    "ürün", "stok", "depo", "cari", "hesap", "banka", "ödeme", "tahsilat",
    "irsaliye", "teklif", "sözleşme", "rapor", "liste", "tanım", "birim",
    "fiyat", "tutar", "vergi", "oran", "tarih", "durum", "işlem", "hareket",
    "satış", "alış", "iade", "sevk", "nakliye", "proje", "personel",
    "şube", "masraf", "gelir")

  val StreetSuffixes: Seq[String] = Seq("Caddesi", "Sokak", "Bulvarı", "Mahallesi")

  val CurrencyCodes: Seq[String] = Seq(
    "TRY", "USD", "EUR", "GBP", "JPY", "CHF", "RUB", "CNY", "SAR", "AED")

  val CitySuffixes: Seq[String] = Seq("köy", "şehir", "ova", "dere", "tepe", "yaka")

  val Letters: Seq[String] = ('a' to 'z').map(_.toString)

  val Adjectives: Seq[String] = Seq("Kırmızı", "Mavi", "Çelik", "Ahşap", "Lüks")
  val Nouns: Seq[String] = Seq("Masa", "Sandalye", "Vida", "Laptop", "Kablo")
}
