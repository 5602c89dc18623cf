package graft.functions

/** Vendored public-suffix snapshot (publicsuffix.org is public data;
  * this container has no egress, so the list is an ICANN-section
  * subset committed here — swap in the complete file at deploy time,
  * the rule SEMANTICS in [[graft.ops.UrlOps.registrableDomain]] are the
  * full algorithm). Three rule kinds per the PSL spec:
  *
  *  - normal rules: the rule's labels are a public suffix
  *  - wildcard rules `*.base`: any ONE label under `base` is a public
  *    suffix (so the registrable domain keeps base+2 labels)
  *  - exception rules `!rule`: prevail over everything; the public
  *    suffix is the rule minus its leftmost label (so the rule itself
  *    is the registrable domain)
  *
  * Longest match wins among non-exception rules; an unlisted TLD gets
  * the implicit `*` rule (last label is the suffix).
  *
  * Snapshot scope (~480 rules vs ~9,700 in the live list): the
  * high-traffic ccSLD families across ~45 registries, the full
  * 47-prefecture Japan set plus the Tokyo special wards and all seven
  * designated-city wildcard/exception pairs, the US `k12/cc/lib.XX.us`
  * grid over all states (the live list carves a handful of per-state
  * quirks out of that grid — deploy-time swap restores them), and the
  * complete wildcard-TLD set. Any suffix outside the snapshot falls
  * back to last-label grouping, which UNDER-groups (too many host
  * clusters) rather than mis-merging — the safe failure direction for
  * crawl dedup caps. */
object PslData {

  private val usStates = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** Japan's 47 prefectures — each a 2-label public suffix. */
  private val jpPrefectures = Seq(
    "hokkaido", "aomori", "iwate", "miyagi", "akita", "yamagata",
    "fukushima", "ibaraki", "tochigi", "gunma", "saitama", "chiba",
    "tokyo", "kanagawa", "niigata", "toyama", "ishikawa", "fukui",
    "yamanashi", "nagano", "gifu", "shizuoka", "aichi", "mie", "shiga",
    "kyoto", "osaka", "hyogo", "nara", "wakayama", "tottori", "shimane",
    "okayama", "hiroshima", "yamaguchi", "tokushima", "kagawa", "ehime",
    "kochi", "fukuoka", "saga", "nagasaki", "kumamoto", "oita",
    "miyazaki", "kagoshima", "okinawa")

  /** Tokyo's 23 special wards — 3-label rules under tokyo.jp (the
    * city-level jp geo family; the live list has ~1,800 such rules
    * across all prefectures, this snapshot carries the Tokyo set). */
  private val tokyoWards = Seq(
    "adachi", "arakawa", "bunkyo", "chiyoda", "chuo", "edogawa",
    "itabashi", "katsushika", "kita", "koto", "meguro", "minato",
    "nakano", "nerima", "ota", "setagaya", "shibuya", "shinagawa",
    "shinjuku", "suginami", "sumida", "taito", "toshima")

  /** Normal rules, grouped by label count (1-label TLDs are redundant
    * with the implicit default rule but kept for fidelity). */
  val normal: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan (generic second-level; prefectures appended below)
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "adv.br", "arq.br",
    "art.br", "ato.br", "bio.br", "blog.br", "bsb.br", "cng.br",
    "cnt.br", "eco.br", "emp.br", "eng.br", "esp.br", "etc.br", "eti.br",
    "far.br", "flog.br", "fm.br", "fnd.br", "fot.br", "fst.br", "g12.br",
    "ggf.br", "imb.br", "ind.br", "inf.br", "jor.br", "jus.br", "leg.br",
    "lel.br", "mat.br", "med.br", "mil.br", "mp.br", "mus.br", "not.br",
    "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br", "qsl.br",
    "radio.br", "rec.br", "slg.br", "srv.br", "taxi.br", "teo.br",
    "tmp.br", "trd.br", "tur.br", "tv.br", "vet.br", "vlog.br",
    "wiki.br", "zlg.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "gov.in", "ac.in",
    "res.in", "mil.in", "nic.in", "ind.in", "edu.in",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "edu.za", "law.za",
    "mil.za", "nom.za", "school.za", "web.za",
    // France
    "asso.fr", "com.fr", "nom.fr", "prd.fr", "tm.fr", "gouv.fr",
    "aeroport.fr", "avocat.fr", "chambagri.fr", "medecin.fr",
    "notaires.fr", "pharmacien.fr", "port.fr", "veterinaire.fr",
    // Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "lodz.pl", "gda.pl",
    "slask.pl", "mazowsze.pl", "mil.pl", "biz.pl", "sklep.pl",
    "shop.pl", "media.pl",
    // Italy (government + a regions/cities slice)
    "gov.it", "edu.it", "abruzzo.it", "basilicata.it", "calabria.it",
    "campania.it", "lazio.it", "liguria.it", "lombardia.it", "marche.it",
    "molise.it", "piemonte.it", "puglia.it", "sardegna.it", "sicilia.it",
    "toscana.it", "umbria.it", "veneto.it", "roma.it", "milano.it",
    "torino.it", "napoli.it", "bologna.it", "firenze.it", "genova.it",
    "venezia.it",
    // Russia
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    // Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kharkov.ua", "lviv.ua", "odessa.ua", "dnipropetrovsk.ua",
    // Spain
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    // Portugal
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt", "publ.pt", "int.pt",
    // Greece
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    // Hungary
    "co.hu", "org.hu", "edu.hu", "gov.hu", "info.hu", "net.hu",
    // Romania
    "com.ro", "org.ro", "tm.ro", "nt.ro", "store.ro", "info.ro",
    "arts.ro", "firm.ro", "nom.ro", "rec.ro", "www.ro",
    // Nordics
    "com.se", "org.se", "pp.se", "tm.se", "priv.no", "mil.no",
    "oslo.no", "bergen.no", "trondheim.no", "stavanger.no",
    // Turkey
    "com.tr", "net.tr", "org.tr", "gen.tr", "web.tr", "gov.tr",
    "edu.tr", "bel.tr", "pol.tr", "k12.tr", "av.tr", "dr.tr", "mil.tr",
    // Korea
    "co.kr", "or.kr", "go.kr", "ne.kr", "re.kr", "pe.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "mil.kr", "seoul.kr",
    "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
    "ulsan.kr", "gyeonggi.kr", "gangwon.kr", "jeju.kr",
    // Taiwan / Hong Kong / Singapore
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "ebiz.tw", "club.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Southeast Asia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "name.my", "co.id", "net.id", "or.id", "web.id", "sch.id", "ac.id",
    "go.id", "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.th", "in.th", "go.th", "ac.th", "net.th", "or.th", "mi.th",
    // Middle East
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "co.il", "org.il", "ac.il", "gov.il", "net.il", "k12.il", "muni.il",
    "idf.il",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    // Africa
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng", "name.ng",
    "sch.ng", "mil.ng", "mobi.ng", "i.ng",
    // Latin America
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "gob.cl", "gov.cl", "mil.cl", "co.cl",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "info.ve", "web.ve", "co.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.ec", "info.ec", "fin.ec", "pro.ec", "med.ec", "edu.ec",
    "gov.ec", "gob.ec", "mil.ec", "net.ec", "org.ec",
    // Pakistan
    "com.pk", "net.pk", "edu.pk", "org.pk", "gov.pk", "fam.pk",
    "biz.pk", "web.pk",
    // 3-label: Australian state education
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au") ++
    jpPrefectures.map(p => s"$p.jp") ++
    tokyoWards.map(w => s"$w.tokyo.jp") ++
    usStates.flatMap(st => Seq(s"k12.$st.us", s"cc.$st.us", s"lib.$st.us"))

  /** Wildcard rules, stored as their base (the `*.` stripped): the
    * complete wildcard-TLD set plus Japan's seven designated-city
    * geographic wildcards. */
  val wildcardBases: Seq[String] = Seq(
    "ck", "er", "bd", "fk", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Exception rules (the leading `!` stripped). */
  val exceptions: Seq[String] = Seq(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  private def labels(s: String): Int = s.count(_ == '.') + 1

  def normalByLen(k: Int): Seq[String] = normal.filter(labels(_) == k)
  def wildcardBasesByLen(k: Int): Seq[String] = wildcardBases.filter(labels(_) == k)
  def exceptionsByLen(k: Int): Seq[String] = exceptions.filter(labels(_) == k)

  /** Longest public suffix any rule can produce (wildcards add one). */
  val maxPsLen: Int = math.max(
    normal.map(labels).max,
    wildcardBases.map(labels).max + 1)
  val maxExcLen: Int = exceptions.map(labels).max
}
