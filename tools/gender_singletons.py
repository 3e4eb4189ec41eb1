"""r10 singleton-name census (VERDICT r9 item 1): the final fidelity
sliver of the gender enrichment (SURVEY §2.4 D6 / reference
``task.py:34,43-51``).

Every first name observed EXACTLY ONCE in the reference dataset's
personnel table that the r1-r9 curated lists did not already cover is
listed here as an explicit, reviewable decision, so that after this
sweep the snapshot has ZERO unreviewed names at any occurrence count:

  - ``MALE`` / ``FEMALE``  -- names the curator confidently labels
    from public given-name knowledge (the same US-SSA-style /
    international given-name lists the nam_dict derives from);
  - ``DECLINED``           -- names the curator reviewed and declined
    to label (non-given-name tokens: numerals, band names, quoted
    nicknames, initials, surname-first tokens; plus genuinely
    ambiguous or unrecognized names).  Written as ``unknown`` -- the
    same bucket the reference produces for names nam_dict lacks.

Consumed by ``tools/vendor_gender_names.py`` (the lists merge after
its own curated blocks; the overlap self-checks cover these too).
NOTE one dataset name (``krist\u00edn``) is stored NFD (i + combining
acute) -- the lists keep the dataset's raw byte form, since the
snapshot lookup joins on the raw lowercased ``first_name``.
"""

MALE = """
aabhas aadarsh aadhi aadish aaditya aakarshan aakshath aarav aarif
aarjav aaryan aaryansh aarón aashay aashif aasif aatmaram aayan abba
abboudy abdalah abdalla abdel-wareth abdelaziz abdelghany abdelilah
abdellatif abdi abdo abdulhussain abdullrahman abdulmajeed abdurrahman
abhijeet abhinay abimana abishek aboudou achint achintya achyut achyuth
adamo adekunle aden adeniyi adeolu adesh adetokumboh adetomiwa adewale
adhir adhitya adhvik adib adinath adipati adisa adisorn adithya adjetey
adolfo adul advait adám afdhal afdlin afeez affif affion agnello agni
agnidev agus agustí ah-in ahan ahron aijaz ajithkumar ajuawak akaash
akarat akarsh akashdeep akbar akhil akhilendra akhmad akihiko akihiro
akihisa akim akito akiyoshi akiyuki akon akshat akshaye alam alano albie
albin aldis aleck aleksei alen alencier alexandros alexey alfoniso
alfons algee alhaji ali-asghar alican alif alik alin aliocha alisdair
aliyar allauddin allu alonzo aloysius alperen alpha altan alun alvaro
alwyn amaan amadeus amadou amaechi amarildo amarr amaury ambarish amed
amer amey ameya amgad amiel amitava amith amitosh amjad aml amole amos
amro amund anas anderson andibachtiar andonis andovi andreo andreuw
andrey andrucha andryan andrás anees aneesh aneirin aneurin ang angga
angshuman aniello anik aniket ankur annadurai ansel anshul anshumaan
antonello antongiulio antonin antwon anubrata anuchit anup anuranjan
anusorn aparshakti apichet apisit apollo apollon apolo aramis aras
arbaaz arbaz archan arda ardal ardhito aric arieh arifin arijit arinzé
ario ariyo arié arjan arjo arjuna arjunan arkady arlen arliss armaan
armen armie armistead arnab arne arnel arnon arnulfo aron arpit arron
arsh arsher arswendi artemiy arthell artiwara artjom artus artyom arul
aruldass arunoday arush arvid arón asa asahi aseem asghar asheesh asher
ashim ashrut ashwani ashwanth ashwath ashwyn ask askar aslam asrani
assaad asser aston ata atanas atharv athiyan atilla atlee atmaram ato
atsajun atthaphan attila audu augie augustin augustine augustus auritra
avadhoot avan avijit avin aviv avraham avrinder avtar awaovieyi awie
ayaan aybars ayden aymen aymeric ayoola ayrton ayush ayushmann azad
azeez azfar azhagamperumal azhan azhy azim azman azwir babatunde babou
baburaj babyjohn bader badih badr badrul bagavathi bagus bahri bahtiyar
bajrangbali bakary balachandran balaji baltasar balthazar banjong banky
bappi barak baran barkhad barnaby barney barnie barrie barton bartosz
bartu bartłomiej basava bashar bashir bastián basu bauddhayan bautista
bayardo bayron bebeto bedabrata bede bedir bedran bejoy bembol bendor
benicio benito benjie benn bent bent-jorgen benu beom-su berg berk
berkan berke bernabé bernardo bernat bernhard bertie berto
bertrand-xavier bessarion bhagath bhagwan bhagyaraj bhalchandra bhanu
bhaskar bhaswar bhavik bhavin bhavkhandan bheki bhisma bholaraj
bhumibhat bhupendra bhuvan biagio biassini bijan bijesh biju bijukuttan
bil bilel binayak bingkun binnu binod binu biodun bipin bir birand
bishop biswajeet biswajit biswanath biswapati bitto biyi bjarke bjorn
bjørn bjørnar blaine boaz bogart bogden bogusz bok-gi bokeem boonsong
boriboon borys bosskey botho boubker bovi boyd brahim brahm branden
branford branscombe brant bratya brecken breckin breno brenton brice
bridger brij brijendra brijesh broden brodie bronisław brontis brutus
bryant bryshere bryson brían buakaw buck bud buddhadev bul-am burhan
burhanuddin burjor burl burnie busta buz buzz buğra byeong-eun byeong-ki
byeong-ok byung-ho byung-hun cab cahit cain cainan caique cajetan caleel
callard camaron camarón camren can canute caradog carel carlito carlson
casimere cassio catalin cauã cavin cayden cayleb ceaser cedrick cemil
ceyhun cezmi chace chadwick chafurin chaiwat chaiyapol chakri chalad
chaleumpol chandrachoor chandrachur chandramohan chandran chang-min
chang-wan chang-wook channegowda channing chansung chantavit chanyeol
charbel chasten chatchawit chavalit chavis chayanop chazz che cheech
chemban chenthu cheol-min cheran cherif chertsak chethan chevy chi-ren
chia-hui chia-liang chidi chidsanupong chien-ming chikahiro chikao chike
chimezie chinawut chinedu ching-wan ching-ying chinmaya chino chiranjit
chito chiwetalu chiwetel chokchai cholsawas chord chukwudi chul-woong
chumel chung-wai chunky chutavuth cian cigano cihan cihat cillian cirroc
civan clancy clayne cleber clemens clement clifton clu clément coen
coerte colman colson colt columbus common conleth conroy coodie cornel
cornelio cornell cortez cosimo cosmin cosmos cotter coy cranston criolo
cristi cristiano cristobal cristóbal csongor cuauhtémoc cuba cung curro
curt curtiss cush cyron cüneyt daan dacre dae-myung dag dagoberto daichi
daigo daiken dal-su dalton daman damani damkerng damone damson daniil
danila daniyal dann danson daran darkiel darko darrel darrin darsheel
dartanian darwin daryle dashiell datta daveed davey davi davis davood
davy davyon davíð dawan dawid dawood dawson dax daymond dean-charles
debaloy debdut dedrick deepankar deepjyoti deforest dejuan dele delzad
demba demetrius demian demián demore demosthenes dempsey denola denton
denzel denzil deobia deok-jae deray deric derick deron derren derrick
derron deshaun desingh desmin destin desus detlev devale devan devansh
devashish devaughn devdutt devender devid dhanesh dhani dhanush
dharampal dharmajan dheer dheeresh dheirya dhilip dhritiman dhruva
dhumal diarmaid dibakar dibang dibyendu diedrich dilawar dileesh diljit
dilkhush dima dingdong diogo diomid dionisio dipankar divyendu djibril
djimo djimon djédjé dmitri dmitriy dmitry dmx do-hyeong do-won doc dodit
dohn dolph dom domenick domhnall dominik donatus donavon donel dong-hae
dong-ho dong-hwi dong-hyuk dong-il dong-seok dong-won dong-yup donghyun
donick donnell donnelly donogh dontrell doru dougray dozie doğaç doğukan
dragos dries dror drummond duban dubán ducu duke dulquer dumisani durai
durgesh dushyant dwyane défano eamonn ebbe ebon edin edmilson edmundo
edouard edson edsson efe efecan efren ehren ehsan ehtesham eiichiro
eijaz eiji eilif einar eirik eisa eita eivaut eivind ejay ekachai ekapol
ekawat ekkachai eko elden elhadj eligio elio elkin ellar elmar eloi eloy
elten elvin elyas elías emanuel emeril emicida emile emilian emilram
emin emory emraan emun emílio enchong eneko enes enver enyinna eoghan
erasmo eray ercan erdem erdogan erek erez ergin ergun eriq erlend erman
ernani ernst errol erroll ersin ertanto ertunç eryk esai esakki esat
eshom eskil eskindir espen estevam etim eudald eugenio eui-sung eun-woo
even everett evgeny ewan ezekiel fabricio fabrício facundo fadlan fadzli
fahadh fahreddin fahri faiez faiq faizan faizon fajar faozan faraaz
faraz fardeen fares fargass farhad farid farishad farjad farooq farouk
farrukh fausto fauzi fawad faycal fayssal fede fedi fehmi feihu fekky
fellipe ferdinand ferdinando ferenc fergus feridun ferit fermí fernán
fero feroze ferran ferzan fevzi fezrul fikret filip filipe fillip finbar
finnlay firass fisher flavor flea flemming flex florin flula fluvio
flávio foaz forbes ford forest fortunato franciszek frantz franz
françois-david françois-xavier frasco frederic fredrik fridtjov
friedrich frode fukushi fumihiro fuminori fumio furkan fuwad fyodor
fyvush fırat g-eazy gabino gad gading gael gafoor gagandeep gaius
gajanan gajendra gajraj gaku gallen gameel ganesan gangadhar ganindra
garin garion garret garrick garrison garth garvin gashmeer gaspar gaten
gatlin gautier gautmik gaël gaëtan gbenro gedeon gelu genezio gengher
genki genndy geno georg ger gerasimos gershwyn gerson gert gervasio
gerónimo gethin geun-hyun ghanem ghanim ghanshyam ghazi gheorghe
giandomenico gianfranco gianmarco giju gilad ginuwine ginés gio giordano
giorgino gippy giwar glauber glynn gnanasambandam gok goki gokul golam
golo gopalan gopalkrishna gore gottfried gotzon goutam goutham goven
govind govinda grady graeme gralen grego gregório greyston grigoriy
grigory gringe grzegorz gulfam gulliver guntur gurdas gurdip gurfateh
gurmeet gurmmeet gurnam gurudev gururaj gurveer gurvinder gustaf gustav
gustave gutemberg gutto guus gyanendra gyu-su géza gísli gökhan göktuğ
görkem gürgen gürkan haaz habibullah hachem hady hae-in hafidz hafiz
hafizul hafreez hafþór haim hairul haissam haitham hakeem hakou
halalisani haldun haleem halil halit haluk hamada hameed hamid hamidreza
hamilton hammou hamzat hamzeh han-yong hang-jun hannibal hanno hanns
hans-heinrich hans-jochen hans-uwe hansal hanung haradhan harbhajan
hardeep hardil harding hardy haresh harinder harith harjap harjit hark
harland harlys harnek harpal harrdy harshavardhan harshil harssh haruki
harvind harwood hashim hasraf hassam hatsunori hauke havarasu havish
hayao haydn hays haysen hazem hazen heath heber hee-chul hee-soon heidar
heino heinz heitor helge hemky henri henri-noël herculano herjunot
hermínio herzl heston heung hicham hidekatsu hidekazu hideki hidenobu
hidetaka hidetoshi hifdzi himesh hippolyte hirohide hirokazu hiromasa
hiroo hiroomi hirotaka hiroto hirotsugu hiroya hisanori hisao hisashi
hisyam hiten hjortur ho-cheol ho-dong hochu hocine hokuto holger
hong-chi hoon-jin hopper horatio hortnarong horton hosea houchu houssam
hovik howie hoyt hrant hridaynath hrithik hsiu-fu huck hugues hulk
humayun hume husni hussan huw hwangwoo hyuk-kwon hyun-bin hyun-moo
hyung-jin hánssel håkon hèctor ianis ibai ibnu ibraheem ice-t ichiro
iddo ido iedil ifeanyi iftekhar igal iginio ik-tae ikkyu ikranagara
ikuji ikuto ikuya ilan ilay ilhan ilian ilias ilker illbliss illya ilya
imad imanol imraan imtiaz in-guk in-gum in-ho in-hwan in-jun in-pyo
inaamulhaq inder indrajeet indrajith indraneil indrans indrasis
indrasish ingar ingo intekhab ioan ion ionut iqbaal irek ireneusz iresh
irrfan irving irwan isao ishai ishtiaque ishtiyak iskandar islam issaka
issam issey itay itsuji itsuki itzan itzik ivar iwan iwao izan izidore
i̇hsan i̇lkin i̇nanç i̇smail j-boog jaap jaber jaboukie jacari jaco
jacopo jad jadakiss jadon jae-eung jae-myung jae-suk jae-sung jaehyo
jaffar jaffer jafta jagan jagapathi jagat jagathy jaggi jagpal jahangir
jaheem jahi jahmil jahzir jai-jin jaideep jaiden jaihind jairam jajang
jak jakub jalal jaleel jalil jamaar jamel jameson jamey jamieson jamil
jamison jan-peter janak jandino jang-hoon jannik janus jaran jarand
jaren jarnail jarod jarome jaromír jaroslaw jarot jarrad jase jassim
jastis jaswant jathin jatin jatinder jatupone jaturong jaume javi javid
jay-z jayakrishnan jayakumar jayaraj jayaram jayasurya jayesh jaylen
jaywant jean-benoît jean-bernard jean-charles jean-christophe
jean-francois jean-henri jean-hugues jean-loup jean-luc jean-marc
jean-patrick jean-paul jean-rené jean-simon jean-yves jean-édouard
jeanfi jedd jee-woon jeet jeetendra jeethu jeeva jefechander jefri jehan
jelle jelson jemaine jen-shuo jencarlos jeong-hak jerald jeric jerjes
jerom jerrold jerónimo jesper jespipat jesuíta jevons jeyan jharrel jhon
jhonen jhong jianqiang jianwen jibrail jibrayl jide jiiva jijo jimit
jimmi jimmie jin-hyuk jin-mo jin-woo jin-wook jinyoung jirakit jirayu
jirayus jirí jishu jitender jivan joaquim jochen jochum jock joedon joem
joen joep jogi johnathon johnnas johnnie johnson johntae joivan joju
jomari jon-paul jonatan jong-chan jong-hwan jong-hyun jong-jun jonjo
joo-hyuk joo-hyung joon joon-hyuk joon-seok joong-hoon joram joren
jorgito jorma joross jos josean joseba joseduardo josse josselin jossi
josu jota jottapê jouji jovan ju-sang juanma judge juergen jugal
juliocesar julious juliusz jumpei jun-ho jun-seong jung-hoon jung-hwan
jung-jae jung-woo junji junki junpei junta junya jurell juston justus
jóhann jóhannes józsef jørgen júlio kaalan kaaris kachormsak kadan kaden
kadiff kadir kahaan kaiet kaiji kailas kailash kais kaisei kaizaad
kaizad kaka kal kalabhavan kalaiyarasan kalidas kalle kalp kalu
kalvadour kamran kanayo kanbolat kandido kanehira kang-ho kanji kannan
kanokchat kantapat kap-soo kappei karam karamo karamveer karel kartar
karthi kartik kartikeya karunas kaseran kaspar kasra kathir katsuhisa
katsunosuke katsuya katsuyuki kaustav kawin kayden kayne kayoze kayvan
kazu kazuaki kazuchika kazuhiko kazunari kazuo kazutoyo kazuyoshi
kazuyuki kean kedrick keean keegan-michael keene keenen kees keetapat
keita keiynan keiyon kellan kelson kenchi kendrick kenichirou kensho
kensuke kentarô kenyu kenzo keong keoni kermit kesava keshav keshto
keston keun-suk kevan kevork keyon keythe khalifa kharaj khary kheiron
khris khristian khumbulani khurram ki-joon ki-jun ki-sung ki-woo kian
kichu kiefer kier kieron kike killian kim-henning kimo kingone kingsford
kingsley kingston kip kippei kireet kiron kisho kishor kittiphak
kittiphong kittisak kiyofumi kiyohiko kiyoyuki klaas kobi kobina kobun
kofi kohsuke kohtee kolton komsan kongkid kongsak korapat kordell korey
kornél kosei kostja kota kouhei kouki kousei koushik koustubh kowit kozo
kranthi kreshna kriengsak krishang krishnakant krishnan krishnendu
krissada kristof kristofer kristoff kristofor kritsanapoom krittanai
krrish krs-one krunoslav krystof ksawery ksshitij kuan-chung kuben
kubhaer kulbhushan kulraj kumail kumaran kumaravel kunaal kunchanuj
kundan kunwar kurtwood kurush kwabena kwang-hyun kwang-soo kwang-sun
kwasi kweku kwesi kwok-kwan kwok-pong kyan kye-sang kygo kylian
kyoo-hyung kyousuke kyran kyu-jong kyung-gu kyung-ho kyung-hoon
kyung-nam kyung-pyo kyung-seok kåre kévin kôichi köksal lachy ladislav
laerte lakha lakshmanan lalo lalor lamar lamman lamont lamorne landung
langston lannick lapat larenz lasse lateef latham laurids lavaughn
lavell lavrenti laxman laxmikant layton laz lehlohonolo leke lekh
lekhraj len lenard lenin lennard lennart leonel leonid levar levin levon
leynar león leónidas liev lijo likit lilrel limbert lin-manuel linas
linder lino linus lionnel lior litefoot lito liviu llewellyn llorenç
lluís lochlyn lochner loic lokesh loknath lombardo lonzo lorcan lorenz
lorne lorànt lotfy loudon louis-do louis-josé louison louka lourinelson
louw lubomir luccas lucian lucius ludacris ludo ludovic ludwig luichi
luk lukman luoyong lutfur lyes mabutho macaulay maceo macintyre mackenyu
maclain macon madhampatti madhavan madhukar madhur madhushan
madhusudhanan magaji magdi mahabir mahabrata mahamadou mahershala
mahfouz mahindra mahmud mahmudul mahmut mahsun maik makio makisig makorn
makram makrand malachi malachy malcolm-jamal malcom malhar malick maliq
malkeet mamoudou man-seok man-sik manabendra manava manbhavan manchindra
manel mangal mani manmohan manobala manohar manoranjan manoël mansoor
mansour manuj maqbul maradona marat marc-andré marc-antoine marcellino
marcin markees markice markin marno maroun marque marquell marquis
marrese marston martavious marthino martijn martiño marton martyn maryo
masaharu masahiro masakazu masanobu masao masataka masatoh masayasu
masood mastan masuo matahi matei matsuya matti mattias mattis maulik
maury mavrick mawi mawuli maximus mayilsamy maz mazhar mazin mccaul
mccoy medhat meegwun meezaan meghanathan mehcad mehul meiyang mekhi
melvil menashe menassa meng-sheng merab merawi merlin merlvin mervyn
mete mfanelo mhamed michael-leon michal michelan michiel michio
michitaka micky midhun miggy mihalis mihir mijail mikaal mikaele mikail
mikhil mikołaj milhem miller min-ho min-hyuk min-jae min-kyu min-sik
min-soo minto mir-jean mircea miroljub mirza mishael mishal mitchel
mithun mitsuhiro mitt mncedisi moatasem moataz moayad moayed moby
modesto mohammad-ali mohanlal mohib mohimen mohinder mohnish moin moinak
moises moisés momodu monte monther montrail moo-yul mort mos mosharraf
mostafizur motoki motomu motonori moustafa moustapha mouzam mozez mridul
mrighdeep mudessir mugihito muhammet muhanad muiris mukhtar munenori
munir munishkanth munjal munro muraina murari murathan murli murphy
murugadoss musa mushtaq musthafa muthukumar mwaura mykelti mykola
mysskin mystikal myung-min myung-ryul nabeel nadav nadji nadzmi
nagarjuna nagraj naif naim najee nakhane nakhul nalin nalneesh namihei
namit namkoong nandhan nantawut naoki naphon napoleon nappon narain
narcisse narein naresh narushi nas naseeruddin nasir nasr nasri nassim
natalino natee nattapol nattapong nattawut naufal nawab nawaf nawapol
nawat nawazuddin nayan nayef nayyar nazareno nazeem nazih nazmi naël
ncuti ndiaga necati necmi nedal nedu nedumudi neels nehemiah neill neils
nejat nekfeu nelsan nemo neven nevil newton nicanor nicholaus nicolò
nidal niek nien-jen nijiro nikitin nikkhil nikola nikolay nikorn nile
niles nilesh niloy nimród nino niraj nirpal nishanth nishil nissar
niteesh nitesh nithin nivas niyi nizar nobuhiko nobunaga nobuo nobutoshi
noman nonzee nopparoj norbert norberto noriaki norihiro norihisa norio
norival noriyuki norton noushad noël nuel nuhash numan nuno nuttapong
nutthasit oabnithi obaid obba obinna octavian octavio octavius odai odd
odd-magnus odiseas odiseo odunlade odwa ofir ogie oisín okey okezie
okieriete oktay oladele olasupo olav olayode oleg olek olgun olu oluseyi
omair omid omung onir onyok orhan orián orkhan osamah osgood osita osmar
osqui ossama ossie otar otoja otávio ousmane oussama ovidiu ovince owain
oweiss ozzy oğuzhan pabllo pachara pacho paddy padmakumar padmanabh
padraic padraig paintal pairoj pandji panji pantelis pantham paopetch
papangkorn paradorn parakh param paramej parikshat parkpoom parno parth
partha parthiban parthveer parvesh parvez parzan pasha pasi pasin
pasquale pasupathy paterson patharamanop patiparn patrizio patryk
patsomtat pattanachai patton patxi paul-mikél paulin paulino pauly
pavail pavan pavlo pavun pawarith payman pearce peder pedja pedring
peeratchai peerawat peerawit pej penn pepón per-olav percelle perci pere
petar petchtai petelo petey petio petrônio peyman phakin phanindra
pharanyu pharrell phellipe phellyx phichet philbert phollawat phoomjai
phumphothingam phutharit phuwanit phuwin pibunsonggram pierre-alain
pierre-françois pierson piet pieter pieter-jan pilou piolo pitchawat
pitcho piti pitisak pitobash pius platon poj pol polat pongkool pongsak
pongsathon ponlawit pooya pope popetorn pornchai porter prabal prabh
prabhas prabhuraj prachakorn pradhuman prakashchandra pramote pran
pranay prasenjit prashantt prasobh prathamesh pratim prawal premanan
premgi prentice price prinz prithvik prithviraj priyadarshi priyesh
pruitt purab purav puttichai pyotr pádraic pál pål pêpê qahtan qaushiq
qavi qayam qays qingfu quang quddus questlove quim quinton qutaiba raad
raaj raam raashul rachit rade radek raditya radosław rady rae-won raf
rafa rafe raffi rafi rafik rafinha raghavan raghavendra raghu raghuvaran
raghuvir ragıp rahart raheem rahim rahman rahmi raimo rainn rajatabha
rajbir rajender rajendran rajendranath rajendraprasad rajit rajkiran
rajkummar rajneesh rajnikanth rajo rajpal raju rajvir rakeen rakeysh
rakim rakshan rakshith ralphie ramanathan ramdane ramdas ramin ramone
ramsés ramy ramzi rance ranjan ranjeet ranjith rannvijay ranveer ranvir
raouf raoul rapeepat rapha rapulana rasaq rashed rasheed rashidi rasim
ratchanont ratchawin ratko raudel raul-gomez raunaq rauno raury rayes
rayson rayver raza razaaq razak razmik razvan redaric redwan reed reeve
regé-jean reijer reinaldo reinhard remi renaud rendi renji reno renzil
rermthon reshad rexen rey reynaldo reynold rhashan rhenzy rhett rhod
riaad rian ribhu ricard richy rickman rickson ridder ridho ridley ridvan
rifaat rikhil rikiya riku rincon ringgo riteish ritwick riz rizal rizwan
roan robbert robi robiul robson rockmond rodolphe rodrigue rodriguez
roel roeland rohn rolan rolando rolfe roly rommel ronaldo ronen ronn
ronreaco ronwaldo roopesh roque rorke roschdy roscoe rosdeen roshdy
roshon rossif rouel rowell roxton royston ruairí ruangroj rudge
rudhraksh rudi rudradeep rudranil ruel rukman rune rup rupan rushad
rushil rushiraj ruslaan russ rutger rutledge rydhen ryken ryle ryuji
ryusei ryushin ryuta ryuzaburo ryuzo rza réal róbert rômulo rüzgar
saagar saahil saamer saandeep sabir sabri sabu sabyasachi sachiin sachit
sadao sadashiv sadeq sadhil sadiq safdar saginaw sahajak saharat saharsh
saharul sahatchai saheb saheed sahidur sahin saidi saif saiju saikumar
sairaj sajal saji sajin sajith sajjad sajjan saksit salahuddin saleem
saleh salem salih sallehuddin salloum salmeen samart sambhaji sammir
sammo samo sampath samu samuele samuell samuthirakani sanaj sanchit
sander sandesh sandhanam sandile sandip sandor sang-ho sang-hun
sang-hyun sang-min sang-myeon sang-soon sangeeth sangpotirat sanin
sanjib sanjiv sanju sanket santhanam santhiran santi santino santo
santram santu sapol sapthagiri sarath sarathbabu saravajeet saravanan
sarawut sardar sarder sarel sarfaraz sarik sarjun sarp sartaaj sartaj
sarthak sarun sarutoki sarvajith sarwar sasho sasson saswata satchit
sathish sathyan sathyaraj satinder satnam satoru sattaphong satwant
satyadeep satyadev satyajit satyaraj satyen satyendra saveliy savin
sayaji saygin saygın saykoji sayyid saïd scoot seamus sechaba sedthawut
sefa sefik segun sehun seif seiichiro seiji seiki seishu sekhar sekoati
selahattin selami selim selman selton selva selvaah selvamani selwyn
selçuk sencer sendhil senthil seok-hwan seok-jeong seok-woo seong-guk
seong-il seong-joo seong-kun seong-mo serhat sermet sermiyan setsuji
settar seul-ong seung-do seung-ho seung-hyeon seung-mok seung-soo
seung-uk seung-un seung-woo seungri sevak sevket seyilaw shaban shabhir
shafi shafieq shafqat shahab shaheizy shahkrit shahnawaz shaji shakeel
shakil shakun shameik shamier shamil shamol shamoon shamyl shamzu
shanavas shanawas shanawaz shanjey shankar shanker shanmugha shantanu
shanthnu shantilal sharan sharat shardul sharib sharif sharlto sharman
sharrieff sharvil shashanka shashilal shataf shatrughan shaul shaunak
shaurya shavendra shavinder shawankorn shawar shawqi shawtane shayan
shayne shazad shehab sheheryar shehzad shekar shekhar shemar shi-hoo
shia shigeaki shigeo shimon shin-il shingo shinichi shinichiro shinpachi
shinsuke shinya shiro shitanshu shiv shivantha shivendra shivkumar shlok
shlomo shmulik shodai shohei shojiro shoojit shotaro shoukath shoukry
showtaro shoya shozo shravan shray shreedhar shresth shrey shridhar
shrihari shrijato shrikanth shriram shubh shugo shuhei shuichi shun
shunji shuntaro shyam shyamal shô si-eon si-kyung siddartha siddhu
siddique sidhartha sidheswar sieger sifiso sigurdur sigurður sijoy
sikander silas silvanus silverio silvestre simeon simu sinbad sindbad
singam sinoj sinqua sion sirachuch sirapop sitaram sittisiri sivagorn
sivakorn sivakumar sivaroj skeet skylan sladen slamet slavko slavoj
smaran smeep snoop socratis sofiane sohayb sohta sohum soichiro soleh
soleiman solvan somchai somlek somnath somyos songsit songyos sonosuke
sonu soo-geun soon-won soori sopon soranut sorin sornram sota soubin
soufiane soukarya soumendra soumyak soundar sourav spalding sparsh
sprague sreejith sreekumar sreenath sreenivasan srikanth srinivas sriram
srivinay stanislas stanislaw stefaan stefon steinar stephane stephon
steve-o sthembiso sting stinus stipe stony strother studs su-jong subba
subbaraju subhajit subhash subhrajyoti subodh subrat suchao suchendra
sudeep sudesh sudhakar sudhi sudhish sudipta suguru suhel sujan sujeeth
sujit sujiwo sujoy suk-kyu sukant sukhdev sukum sulayman sumanta sumanth
sumanto sumesh sumet sumret sun-gyu sundar sundeep suneel sung-hyun
sung-min sung-rok sung-soo sung-woong sung-yeol sunkanmi supachai
supanut suparn supasit supavitch suphachai suppakorn surapol surasak
surendra surinder suriya suseenthiran sushrut susumu suthep suthpong
sutthirak suvinder suyog sveinn sven-bertil sverrir swanand swandand
swapnaneel swen syafie syafiq syamsul syazwan syrus szabolcs sílvio
sönke sırrı taaruk tachakorn tachatorn tadahiro tadanobu tadashi tae-goo
tae-ho tae-hyun tae-yeol taecyeon tagel taha tahar tahir tai-lo tai-ping
taichi taika taiki taishi taiten taito takaaki takanobu takehiro
takehito takenori taketora takuma talha talib tamas tamim tamotsu tanaji
tanawat tanay taner tanju tanmay tanutchai taras tardu tareq tarlochan
tarusuke tarzan tat-ming tatanka tatchapol tathagata tathastu tatsuhisa
tatsuomi tatsushi tatsuya taufiq tauquir tawfik tayo tchéky te-lo tedd
tedros teera teeradon teeranai teetatch tejpal tekin temuera tenoch
teoman tequan terrance teruaki tessho tetsuhiro tetsuji tetsuo tetta
teuku tewfik thabang thaddeus thaer thagubothu thalaivasal thammegowda
thanabordee thanadol thanapob thanawat thanawetch thanawin thaneth
thanongsak tharun thassapak thawat thayer theebaan theeradej theerapat
thelonious thelonius thiagarajan thibault thijs thirawat thiru thobani
thongpoom thony thorbjørn thorsten thorston thure thurop thusitha tiago
tiberio ticoon tigmanshu tijmen til tilak tilman tilo timini timon
timothée tinesh tino tirso tirth tishuan tituss tizoc tobe tobey tobi
tobin tod todor todrick todsapol tokala tomm tomoaki tomoharu tomohisa
tomorowo tomotaka toney toomtam topher topol toprak tor torfinn torquil
torrance torsten tosatid toshihiko toshinori toshiro toshiya tovino
travaris treat trestin trevante trezzo trilok trivikram trpimir trystan
tsahi tshepo tsung-hua tsutomu tudor tuface tuhin tuncel turabi turki
turlough tusshar tuğrul txema tyger tygh tygo tyree tyreese tyrel tyrese
tyson tzi tómas u-kwon uchemba udai udaya udhay udhayanidhi udom ufuk
ugam ugur ui-seok ulaş uli ulises ullas ulvi uly umang umer unax unni
unnop unsho upen upendra upyendra uraaz uraz uriah urs usain ushan ushio
usman usop utsav uttam uttung vachirawich vadivelu vahid vahldin
vaidotas vaishwath vajdaan valentijn valerio valin valur vamsi vannapoom
vanness vansh vargus varoon varot varuth varzu vasan vasanth vassili
vasu vaughn vebjørn vedabrata vedant vedat veer veerendra veeru vegar
velibor venantino venky venugopan verdi verne vetri vetrimaaran vibhu
vicellous victorio vidhur vidit vidyadhar viggo vignesh vihaan vihang
viineet vijayant vijayaraghavan vijayendra vijilesh vikramaditya
vikramjeet vikri ville vimal vinayakan vincente ving vinil vinnie vinny
vinson vinícius vir viraaj viraf virender virendra virgile virgilio
vishagan vishwa vishwajeet vishwaksen visute viswanathan vitaly vithaya
vittorio vivaan vivan vivekanand vladimír vlado vojislav volkan volkmar
vondie vorarit vrajesh vrijesh vrishasen vrund vusi vuyo wafeeq wahab
waldo walerian walker walt walton waly wandile warawut ward warot
warwick waseem waymon waël weber wei-hsun welker wendel wentworth wenty
weston whindersson wiesław wilbur wiley wilford wilfree willam wille
wills winai wiradit wissam wiwat wladimir wole wolf won-joong won-keun
won-sang wonho woo-bin woo-jin woong-in worrawech wotan wouter wymen
władysław włodzimierz xabiani xabier xolo xosé xzibit yacine yahir yahya
yakub yakubu yameen yance yancey yancy yanic yaniv yankel yannick
yanyong yaroslav yashodhan yashpal yashvit yashwant yasin yassine yassir
yasuhi yasuo yasuyuki yatin yavuz yayan yağız ye-sung yehia yehoram
yehuda yen-j yeong-gyu yeong-jin yeong-mun yeong-wung yetkin yibrán
yiftach yigal yilmaz yingsak yoann yoav yog yogendra yogi yograj yohei
yoichi yojiro yong-gun yong-soo yongwoo yorgo yorgos yorick yorke yoshi
yoshihisa yoshiki yoshimasa yoshinori yoshiro yoshitaka yoshito
yoshitsugu yoshiyoshi yoshua yosi youcef young-chang young-chul
young-deuk young-jo young-kwang youssouf youssouff yu-chun yu-hwan
yu-seok yuchang yudhishtir yudhveer yugan yuhei yukiyoshi yun-hoo yunus
yurdaer yuriy yusaku yusril yuthana yuuichirou yuvraj yuzuru yvick
yvonnick yılmaz z-chen zackary zahiril zaid zaidi zakes zakir zamokuhle
zane zanjoe zayne zdenko zedrick zeek zeke zeljko zell zeno zeppi
zhaohua zhenwei zhigang zhiheng zhuangzhuang ziga zijad zitao zizan
zlatko zolani zolisa zoran zsolt zuko zwelakhe zydrunas zyon çagan
çağatay çağdaş çağlar édgar érico étienne ícaro òscar ólafur óskar özgür
özkan øystein ünal þorsteinn þröstur čestmír łukasz şahin şenol şerif
şinasi şükrü ṣọpẹ́
""".split()

FEMALE = """
aachal aaditi aadya aahana aamina aanchal aarna aarohi aarushi aasha
aashi abbey abbi abbie abena achala acushla-tara adah adalgisa additi
adelaida adele adelfa adesua adibah adina adinia adjoa adora adreea
adrianne adunni advah ae-yeon aenne afaf afi afia aga agathe aggeliki
agniya agot agyness ah-sung ahd ahlaam ahlam ahney ahsaas ahu ai-ai aidy
aiko aileen ailen ailsa aimee-ffion aimée aina aino aislinn aissatou
aitana ajanae ajiona akansha akari akiko akina akofa akosua alaina
alanah alannah alanoud alberta aldís alesha alethea aletheia alexxis
alexz aleyda alfre aliaa alicyn alie aliette aliza alla allene almila
almira almudena alona alondra altagracia alyona alysha alyshia alyssya
alyvia amaia amaka amalie amandla amaryllis ambika ambujakshi ambyr
ameena ameerah ameesha amel aminaa aminah amira amirah amna amybeth
amyza ana-maría anabel anabela anabelle anagha anahit anaitha analeigh
analú anamaria anandhi anangsha anarkali anastasiya anaïs ane aneesha
aneeta anelis anemone anette angelababy angeles angeli angelic angelika
angelines angellie angelu angely anggika angira angélique anilú anima
anitta anjelah anjelika anjori anke ann-margret anna-maria annabeth
annaleigh annalise annalynne annasophia anndi anne-laure anne-solenne
anne-sophie anneke annemarie annet annick annisa annita anoushka anri
anshikaa ansiba antara antje antonella antonique anuja anula anumegha
anupriya anuradha anuschka anuskha anvita anwen anwulika anél aowyn
apapattra apaporn aparajita aphiradi apinya apittha apollonia apurva
araba arabella araceli aracely arachaporn arancha arantxa arantza arati
araya arcelia archita aretha arianne arisara arja arlene arlette arlinda
armeena armida arndís aroha arpasiri arpita arshima arsinée arwa arzetti
asako asal aseel asenla ashalata ashanti ashiqa ashlee ashlie ashwiny
asin asma asmara assumpta assun assunta astrea atchareeya atheena athena
athiya athulya atikah atilia atiqa atiqah atsadaporn atsumi
aude-laurence audra audrie audrina aunjanue aure aurelie aurore aury
aurélia autumn avani avantika avgousta avika avishma aviva avril
awkwafina axelle ayah ayahi ayame ayana ayane ayano aybike ayda ayelet
aylin aylín aymee aysegül aysha ayushita ayçe ayşegül ayşen ayşenil
ayşenur azalia azealia azeen azekah azela aziza azul azumi azura azusa
açelya aída aïcha aňa babetida babs badria badriya bahni bailee banu
barbra barbro barkha basak basma bassima bathsheba baya beanie beata
beauty becci bedia beeban begoña belen belle belçim benedetta benedikte
bensu bente beren berglind bess bessie bestemsu betiana bettina beverley
bex beyoncé bhama bhargavi bhavika bhavna bhoomika bhumi bibeth bibi
biddy bidita bidya bijou bindiya bindu binnur bipasha birce birdie birna
birva bisola blossom blythe bobbi bojana bolanle bonni bosy bothaina
bouthayna braelyn brandi brandy branka breanna breeda brendee brenna
brennley brené bresha bria bridey bridgit bridie brie brigette briggitte
brigid brina britne britney britta bronagh bryana brynna bryony brytnee
brytni bunga bunmi burçin busy bérengère büşra cacai cady caeli caetlyn
caia cailey caitriona caity caledonia calliope camélia candi candis
caoilinn caren cariba carice carishma carissa carlotta carlyn carme
carmen-maja carmenza carrie-anne caryn carys cassi cassia cassidey
cassie catarina catelina catharine cathryn catrin catrinel cch cecily
celile ceren cerina chabeli chaleeda chanda chandana chandreyee chanelle
chani chanicha chanté chanya chanyapuk charebelle charissa charlbi
charlet charlott charlyne charneice charu chasity chaunté chaya chayanit
chelah chelle chelsey cherami cheri cherie chermarn cheska cheyenne
chhaya chidinma chienna chiho chikako chinatsu chinaza chinmayee
chinmayi chinonye chipo chitra chitrashi chiung-hsuan chiwa chrishell
chrissie christelle chrystee chrysti chudapha chunya churni chutimon
chutirada chyler chyna ciana cicely cida cierra cinta cinthya cissy
citra clare-hope clarissa clea clementina clemmie cleopatra cloris
clover cláudia clémentine cobie colette coline collette conchata
conchita condola cora coral cordelia corinna corri corrine cortney
costanza cote coumba courtenay courteney cozi cressida crina cristabel
cristela cristiana cristin cristy cybill cydney cynda cyndi cynthy
cécile da-hae da-ye da-young daffany dagmar dagmara dagny dajana dakore
daksha dalila dalilah damayanti daminee damla danai dania danika danitza
danneel danni danying daraneenuch dascha dava daveigh davie-blue davika
dawnisha dayci deah deana deann deanna debamitra debbi debby debrianna
debs deeksha deelia deepal deepshikha deleila delia delimawati delta
dena dendrie deneen denira dennenesch denyce dervla devadarshini devaki
devi deyanira deysha dhanshree dhansika dia diahann diandra dianna
dichen dido diem dilber dilnaz dilraba dilşah dineo dionne dipannita
disa dita ditte djamila djenar dobrina doesjka donita doon doona dorcas
dori dorota dorra dotsie dove doyin draya dreama dree drena du-shim
duangjai duangta dulari durdana durga duygu dèlia eadie earleen
earnestine ebony ececan ecem edda edita edmay edwina edyta eelyn eesha
effie eiza ekaterina ekavali ela elaiza elanne elarica elen elicia elin
elinet elisabet elisabetta elisse elitsa elize elke ella-rae elle-máijá
ellena ellia ellise elma elnaaz elodie eloisa elora elpidia elvina
elvire elya elyse elysia emanuela emayatzy embeth emelie emika
emilie-claire emilija emilyn emiri emmaline emmanuella emmeline emmie
empress emyri enhle enid enid-raye enissa entesar entessar entsar
erlinda erma eréndira esin esma esmeralda esom esperanza essence essie
estefanía estela esti estrella etsuko eucharia euridice evangeline
evgeniya evie fabianne fabienne fabiula fadia fadily fahriye fairuza
faiza famke fanesa fania fann faradina faryal farzana fasha fatema faten
fathimah fatou-elise fatym fazila felecia felicitas fenna ferdoos feryal
fionna fionnula fiorenza firrina fisiwe fitria flaminia flonja flore
floria floriana florinda fockeline fotinì franca francisca franka
frederique freema freida freja frida-lovisa frieda friederike fritzi
fryda frédérique fuka fuko fumika fumiko fumino fumiyo funda funke
funlola funmi fátima füsun gabbriette gabourey gabrella gaia gal gala
galatea gamze ganthida garance garcelle gargeyi gauhar gayane gayathrie
gayatri gayle gazala geena geetu geleen genelle geneviève genna genneya
germaine gesya geummi ghada ghadah ghadeer ghita giada gianna gine
ginifer ginnifer giobanna girija girja gisa gisselle gisèle gita
gitanjali gitta gitte glaiza glenne glynis goapele goizalde goize golda
goldie golshifteh gonca gracia gracie gracyn greeshma greet greeva
greteli grettell gritte gudrun guinevere guiomar gulnaaz gulsara gunjan
gupse gwen gwynyth gül gülenay güler gülhan gülse gülsüm gülçin gümeç
güneş ha-na ha-nui ha-yeon hadeel hadijah hafsia hailee hailie haillie
hajira hajra hajrah halina halitha halldóra halle halley hania hanne
hansika hariata haripriya harmony haruhi harumi hasinatu haskiri hasmine
hatice hattaya hattie havana haven haviland haya hayat hayatem haylie
hazal hazuki heart hee-ae hee-ra heeba heena hege helana helene helin
heljä helly heléne hemangi henryka hera herizen hermila hettienne hetvi
hiba hikari hilal hilde hildegard hildegun hillary hilliary hima himani
hinaki hinako hishiko hlengiwe holli homare honami hongyok honor horeya
houda houko houria hrishitaa hsiu-ling hsueh-erh huma humaima hwa-young
hye-eun hye-jung hye-soo hye-sun hye-won hye-yoon hye-young hynden
hyo-ri hyo-young hyun-joo iaia icíar idina ieva ihana ikue ila ilamaria
ilanah ildiko ilene ilenia ilfanesh ilham iliza ilka illeana inanna
inbar inda indah indhumathi indianna indu indya ine inga ingeborga
inggrid ingunn iniya injy inori ione iravati irem iretiola irmak
irmawati isabela ishika isil islie itahisa itala italia itatí itsaso iva
ivie ivona iwona izabella izabelle izara i̇clal i̇kra i̇layda i̇lknur
i̇rem i̇ştar ja-in jabulile jacinda jacki jackée jacquie jada jadagrace
jadah jadesola jadwiga jailoshini jaimi jaki jalyn jameela jami
jamie-lynn jana janae janani janeane janella janhvi janicke janina
janita janni janset january janya janyse jaqueline jaroslava jasika
jasleen jasmina javicia jaya jayapradha jaycee jayde jayma jayshree
jeana jeananne jeanie jeanna jeannette jeannettsy jeannine jeanté jeany
jeeja jehane jella jely jena jenelle jenessa jeneva jenica jenifer
jeniffer jennette jennylyn jenée jeong-hwa jeonghwa jeri jerri jeryl
jessa jessalyn jessamine-bliss jesseca jessi jessica-jane jessika jewel
jhansi jhanvi jhilmil ji-an ji-eun ji-hye ji-hyun ji-yeon ji-yoon jia
jiavani jidapa jihae jihane jin-joo jing-jing jintanutda jisca jiya
joana jobeth jocelin jodelle jodhi joeley johana johannah johanne
jolanta jolene jolente jolijn jolin jomjaoi jonell joni jonita jonquil
joo-eun joo-yeon joosje jordin josefin josefina josiane jossara jovanka
jowharah judi juditta judyann julene juli juliane julianna julieth
julissa july jurnee justina justyna jyothika jyotii jytte-merle jéssica
jóhanna jördis jülide kaamya kacey kacie kadee kae kaede kaelynn kahina
kahyun kaia kaija kaila kailyn kainaat kainaz kajol kaley kaliayh
kalilah kalki kalyanee kalyani kamala kamalika kami kamolned kanchan
kanchana kandi kandis kandyse kaneez kangana kangna kaniehtiio kanjana
kanjanaporn kanlaya kanon kanthi kanyawee kareena karen-lise karey
kariam karimah karin karine karishma karisma karissa karli karlie karly
karole karra karrueche karthika kartika kartina karyme karyn kassandra
kasumi katee katelijne katelyn kath kathaleeya katharin katharina
katheryn kati katija katiuscia katlyn katriina katrine katya kaurwakee
kausar kavya kaycee kaycie kaylee kayra kaytha kazue keara kearia keeley
keelin keerthy keeya keisha kejmanee keke kelcey kelis kellita kelsy
kelzy kema kemi-bo kemisara kendra kenna kennedi kenza keri kerith kerri
kezia khadija khadijha khairia khairiah khalima khiyla khushboo khushbu
khushi kia kiara kiearra kiele kiera kiersey kierston kiku kikuko
kimberly-rose kimberly-sue kimelia kimia kimie kimlinh kimrie kinaryosih
kinna kinuo kiray kiri kiria kirrilee kirron kirstie kirsty kirti kiyono
kjersti klara klea kochakorn koel koena koharu komegumi koneenica
konkona korie korine kornpassorn kotono kotori kourtney koyuki krissiri
kristanna kristie kristiina kristín kristy kristyl kritteera krutika
krysia krysta krysten krystin ksenia kseniya kubbra kushalini kyana
kyanna kylee kymsleen kyooko laaibah laara lacey lacy lada ladya
laeticia laetitia laia lainie lala lalainia lalana lale lamis lamitta
lamonica lanette lapassalal laraine larisa larita lark lasja lata
latanya latarsha laudya laure laurieann laverne laysla laëtitia laïla
leandra lebleba leen leena leidi leigh-allyn leilah leilani leisha leiya
leleti lelia lellê lene lenita lenka lenna lenora lenore leona leonor
leontine lepacious lesley-ann lesley-anne letitia letizia lexy leyla
li-li liane lidya liesel liesl lika lilibet lilimar lilla lillete
lilliya lilou lily-rose lindiwe linh linnea linor linsay linzey liora
lisa-marie lisagay lisaraye lisbeth lisi liss lissa lita litzy livia
lizelle lizz lizze lolita lolly lone lonette lorinska lorita lorynn
lotje lotlot lotte louanne loubna loukia louriza loveleen lovie lubna
luci luciane lucila lucinda lucinta lucretia lucrezia ludivine ludovica
luellem luenell luisana lumi luminita lun-mei lupita lusia luvvie lygia
lykke lyla lyn lyndsey lyndsy lynette lynita maanvi macey madaleine
madalen madalina maddison maddy madelaine madelyn madhu madhumalti
madhumita madhura madhurima madisen madisyn madlyn maeshni mafalda
magali magaly magdyel magela maggi maguy magüi mahaley mahek mahia mahie
mahnaz mahreen maiara maica maiko maile maithili maitreyi maizura
maj-britt majdouline majel makiko malak malala malavika malavikka
maleeka malen malese malia malika malin malina malinda mallory malobika
malu malvika mamata mamen mamie mamta mamtha manaka manami mananya
manasa manasi manatsanun mandana mandie mandira manika manimegalai
manisha manjari manjiri mansha manya marceline marcella maree maren
margaux margo mariama maricar marie-ange marie-evelyne marie-françoise
marie-ginette marie-josée marie-julie marie-line marie-philomène
marie-sophie mariee marieh mariel marielle marieve marije marilou marilu
marimar marinda marine mariola marit maritoni maritza marja marlann
marquita marsai marshanda marthe martyna martynika mary-kate mary-louise
maryana maryann maryjun maryke marzia masaba masha masika matet matila
matilda matleena matreya matsuri mattea maud maude maulidina maura mavie
maxene maxine mayhara mayling maymay mayté mayuki maísa mbissine mckayla
mckenna meadow meagen meaghan medha medina meegan meenu megalyn meganne
megha mehak mehreen meibh meisa mekaila melahat melani melany melba
melia melika melissanthi meliz melonie mena mengqin menha meriem merila
merle merna merrin merry merve meryem meryll methinee meytal mi-ji
mi-kyung mi-ran mi-sook miah michaella michalina micheline michiko
michiyo michole michèle micole midori mie mieke mieko mihaela miho miina
mijke milagros milena miley milia millaray mille milvia mima minako
minerva ming-na minissha minka mioko miona miori mirai mirei mirella
miren miriama miroslava misaki misako mishqah mislina missy misuzu
mithila miwako miyako miyoko miyuki miyuri moataza modupe moeka moira
mollee mollie momona monal monalisa monaliza monchanok moneca monia
monikangana monisha morakot morena morgana morna morwenna moshira
moumita mouni moushumi mozhan mrinalini mrunmayee mugdha muguet muireann
mukti mumait mumtaz munira muskaan muskkaan musskan mutsumi mwajuma mya
myanna mylene myndy myolie myrna mädchen mélodie mélusine mía mónika
müge müjde nabilah nachjaree nadezhda nadhira nadhiya nadiya nadya
nafessa nafisa nagita nagma nagshree nagua nagwa nahana nahanni nahatai
nahla nahoko nahyun naidra nailea naima naina najat najiba najwa nakia
nalan nambitha namrata namya nan nanako nanami nanase nandana nanette
nanfu nanna nannaphas narges nargis narisara narumi naruna narupornkamol
nastashia nastassia natacha natalia-jade natalija nataliya natasia
natassha natassia natasza nataya natcha nathania natharinee natoo
nattalyee nattarika nattasha natthawara natthaweeranuch natthida
natticha naturi natàlia natália nauheed nausicaa navia navni nawal nawar
nawarat nayani nayantara nayanthara nayo nayobe nazeera nazia nazneen
nazriya necar neda neelima neelu neen neerja neeru neeta nehir neide nel
nelli nelufar nena nermin neshma neslihan nesreen neus neva neve nevra
nezha ngaio ngozi nichaphat nichelle nicholle nicoletta nicolette
nicoline nicollette nida niecy niena niharica niharika nikhila nikhita
niki nikolett nila nilacha nilay nilgün nilperi nilu nimisha nimmi nimra
ninel ninet ninette ninik niranjani nirina nirmala nirmiti nirupa
nisawan nisha nishanti nisheeta nishka nithiyia nithya nithyasri nittha
nitu nivedhithaa nivetha niza nneka nobuko nobulali noemí nohely
nokuthula noma nomalanga nomboniso nomonde nompilo nomzamo nona noni
nonie nonna noo-ri noomi nora-jane norah noree norlia noureen novie
noxee nqobile nuchanart numthip nungira nupur nurfathiah nurgül nursel
nushrat nutnicha nyla nzingha nína nóra núria o-lan oaklee odenike odeya
ofelia oksana olimpia olinca olka olwen olympia omara omoni omotola
omotunde omowunmi omoye onata ophelia oprah orchita oriah orly orna
ornella ornjira orrawan otilia oulaya oviya oyefunke paakhi padita
padmavati paget pailin pajaree pakija pakkaramai pakwan palina palomi
pamiga pammi panadda panisara panissara pankhuri pari parineeti parna
parul parvathi parvin pasqualina passaranan pastora patience patina
patravadi patrika patrycja patty paulette pauley paulyn pavadee pavitra
pavleen payal payel penpak penélope perdita perizaad pernilla persia
pervin petchpatchara petrice pevita pfifer phantira phattharanarin
phenphet philece philippa phillipa philypa phylicia piaa piera pierra
pihla pihu pili pilita pim pimmara pimpakan pimthong pinchoo pinky pirjo
pirkko pisamai pitchanart pixie piyathida ploy ployshompoo pokchat
pollyanna pooneh porntip poulomi praewa pragathi prajakta praneetha
prarthana prashasti prateeksha precious preechaya preetika preeyada
preity prilly princesa priscilla-anne prisha prisia priti priyaa
priyamani priyamvada prudence prue pujitha punam purnima pushpa pushtii
puttachat pía pınar queenie quetzalli quintessa quvenzhané raashi
rachaya racquel rafeaa raffey ragia ragini ragnhild rahama rahma rahmah
rahne raima raina raini rainie rajia rajshree rajshri rakchawan rakhee
rakhi rakul raline raluca rambha ranee rani ranjeeta ranjita rasha
rashida rashmika rathna rati ratnabali ratnamala ratnawati raven
raven-symoné raviyanun ravshana rawan rawia rawsan rayana raye rayka
raylene rebeca rebecka rebekka reena regine rehana reika reinhilde rekha
rekiya remas renae reni renu reshmi rethabile retta revalina revathy
reylynn rezeta rhosinah riann rianti richelle richenda ricki riddhi
riele rifka riho riisa rika rikako rikke rila rimi rinkle rinko rinna
rinrada riria ririka rishina ritabhari ritisha rituparna ritwika riva
rivka rizka robinne rochenda rockwelle roda rohena rohini rojda rolonda
romane romi romola rona rona-lee ronda ronee ronjini ronke ronna
ronnawee roos rosabell rosalina rosalind rosalinda rosaline rosanne
rosario rosemarie roshini rosin rosina roslyn rosmeri rosnah rossana
rowena roxana roxann rozi rozie rucha ruchi rudklao ruffa rukiya rukshar
rumer runa ruthie rutina ruzana rynn ryoka ryszarda rytasha réka sa-hee
sa-rang saadhika saadiya sabaah sabeeka sabitha sabrine sabriye sabryn
sadaf sadeem sadia sadiya sae-ron safaa safira sagarika sagine sahabanu
sahana sahila saira sairi saiyami sajitha sakiko sakina salama salamina
saleha salima saloni salvita salwa samaa samaira samaire samiha samita
samiya sammaria samruddhi sanae sanah sanam sananthachat sanchana
sanchari sandeepa sandershika sandhya sanet sang-hee sangeeta sanghmitra
saniyya sanjeeda sanjivani santwana saoirse saoirse-monica saowaluck
saphia sarah-jane sarah-jeanne sarah-sofie saranya saratswadee sarayu
sareh sarena sarina sarinrat sarrah sasheer sasithorn sasqia satsuki
sauraseni savika savithri sawako sawanee sawanya sawitree sayali sayani
saycon sayli saïda scaachi se-yeon seandrea sebnem secunda sedef seerat
seeta seethabaala seidy sejal selah selda selena selena-marie selenis
selima selin seline seo-ra seohyun seol-hyun seola seolhyun seon-a
serayah seren serenity sethulekshmi seung-ah severija seweryna seychelle
seyneb seána shaana shaanthala shabana shadae shadia shae shafira
shaghayegh shagufta shahad shahana shahd shahira shaila shailashree
shailyn shaima shaista shalu shamaine shamilla shamita shannyn shanola
shantel shantol shany shanyn shaquila shara sharada sharanya sharda
shareefa shareena sharmeen sharmila sharmin sharona sharvani sharvari
shashawnee shashikala shatina shavidee shawna shayle shaylee sheela
shelia shenaz shenell shenthy shenty shepsut sheranut shereen sheri
sherie sherihan shernaz shernaza shery shikoo shima shin-ae shin-yeon
shira shirine shivalati shivatmika shobana shofia shohreh shoko shonali
shondrella shoshana shoshannah shradha shreiya shriswara shrusti shubha
shuri shwetambari shyrley sia sibulele sibylla sicily sidné sidse
sigourney sika silje silma silvetty simbi simbiatu sindhu sinead sinem
singri sinjai sinéad sira siria siribanchawan sirin sirinya sisanda
sisley sitang siti sixtine skai so-hui so-hyun so-min so-ri so-yi
so-young soad sobhita socheata soefira sofie sofiko sofinar soha sohaila
sohee solbi solbjørg somaya somkele sommore sona sonakshi sonalee
sonalli sonamoni sonequa songül soniya sonoya soo-an soo-jeong soo-jin
soo-kyung soo-yeon soo-young sooni sophiya sopitnapa soraya sornsin
sosie sothea sotida souheir soundos soussan soyeon spruha sreela
sreelekha sreymoch sreyneang sridevi srilekha sruthi stacia stacie
stacii stana stanisława starletta stavroula stefanee stefania stefanía
steinunn stephnie stina stockard stormi stuti stéfi su-yun suangporn
suanne subhashini subiksha suchada suchandra suchaya sucheta suchita
sudabeh sudeepa sue-ann sugeeta suha suhair suhani suhartini suhita
sukania sukhmani suki sukirti sukki sulabha sulekha suliane sulochana
suma sumalee sumi sumiko sumita sumona sumontha sumriddhi sumruddhi
sun-kyung sun-young suna sunaina sunanta sunitha sunnee sunni sunnie
sunnyi sunshine supakson supanart supassra supatra supavitra surangana
suranne surekha suri surleen suruchi surveen sushama sushar susi sutatta
suthada sutthatip suvela suzanna suzannah suzette suzi suzu suzuko suzy
svati svenja swagata swantje swapna swarangi swastika sweety sydelle
sylvaine symara symera syna synnøve syra syrine szu-chia sári taapsee
tabu tae-im taeko taheya tahirah tainá taissa tajja takayo takla
taksaorn tala taliah taliana taline talitha taliyah tamae tamaki tamala
tamannaah tamera tamina tamla tammi tamsen tamta tamzin tanaaz taneea
tangie tanishaa tanit tanja tanna tannishtha tansu tantoo tanusree
tanwarin tapsee taraana taraji tarana tarisa tarita tarryn taryn tarynn
tashneem taskya tasma tati tatjana tava tawny taylar taylour teairra
teca tegwen tejashree temi tempestt teni tenika teodora teotola tere
terele terrie tesarnia tetchie teté teuila teya teyana teyonah thaddea
thaila thali thamyra thandeka thandi thanuja thanusree thanya thanyanan
tharoth thaynara thaís thea thembi thembisa thenjiwe thomasin thora
tiarnie tiaré ticha tichina tiera tiffani tiffanie tihana tika tillie
tillotama tinarie tine tini tinka tioreore tiosha tiphaine tisca tisha
tiya toinette tomoka towanda toya tracie trang tridha trieste trilby
trimala trina trine tripti troian trudi trudie trudy trula tsisia tsulan
tuesday tugçe tulip tuppence tutie tuulia tuvana twinkle txell tássia
téa tülin türkü u-ie ulka ulrike ulyana umika una ungsumalynn unjoo
uqasha urara urszula urwa urzila usashi uttara uzo vaidehi vaishnavi
vaisnavi vajèn valarie valeriya valli valsala vanda vanesa vanesha
vaneza vangie vania vanita varalakshmi varatta varsha vasana vasuki
vathusiri veanne vedashree vedika veeni veerle vela vella vennela venus
vera-ellen vered verna veruska verónika vianey viann vibeke vibha
vibhavari vibhawari vica vicenta vichuda vicki vickie victoire victòria
vidushi vidyullekha vienna vilma vinaya vincy vinessa vinodhini violante
violetta violette virithipa virti vishakha vismaya vitaliya vittoria
vitória viviane vivica vivien vivieno vlasta vonda vonny vyjayanthimala
vyjayantimala waad waheeda wallis wanida wannisa warda warisara wedad
weica wenche wendee wendie wenpei wenwen weruche westny whoopi widika
widuri widyawati wika wilza wimolphan winona wiolka wiyona woo-hee
woranuch wrenn wulan wumi wunmi xana xochitl xyriel yaani yadhira yafit
yaima yalitza yamaneika yami yamila yamini yamée yana yanee yangzom
yanina yareli yarichada yashaswini yasirah yasmina yassi yasuko yayaying
yağmur ye-ji ye-ri ye-won yeardley yeni yenn yennis yeo-jin yeon-seo
yesim yetunde yi-wen yiddá ying-ying yingying ylva yo-landi yo-won
yocelin yoka yolonda yomary yoon-ah yoon-hee yoshika you-jeong you-mi
young-ae young-hee ysa yu-mi yuhko yuho yuiko yuina yukana yukiyo yulia
yuly yumiko yusra yussra yuvika yuzuha yuzuka zabou zabryna zaela zahia
zaira zakeeya zalfa zaria zarine zaskia zatella zawe zayidiyya zazie
zdenka zeenat zehra zeina zena zenande zendaya zenia zenobia zhalay
zharick ziesha zimkhitha zina zindzi zohra zoie zooey zora zosia zouzou
zozeen zoé zsa zsuzsa zulay zulfa zuzanna zynnell zélie àgata ágústa
çiğdem çolpan érika éva ísold özay özgü özgün ülkü şebnem şükran
""".split()

DECLINED = """
"riley" 'najite 2 4minute 50 a a.c. a.d. a.k. a.s. aadukalam aarubala
aayam abayomi abella acha aci adaar adain adair adama adea adjis adlu
adoor adria adrià adze ae aenie aeril afalean afieq agam agasyah aggy
agha agnese ah ahaji ahishor aia ainsley ainy aishan aissa ait ajab ak
akah akara akarin akeno akhigbe akit akiya aksha ala albee albloushi
aldan aleks aleksa alese aleyse aleza alhamadi alibaba alicky alien
alissa alisson alián aljin alkoya allende almulla almunsif alo along
alosian althogali alva alyy alzaabi alê am amandha amaraja amardeep
amarin amarjeet amarjit amarpreet amerul amitoj amma amman ammo ammy
amornrit amrinder amrish amshan anajosé anamaya anandito anang ananth
anantharam anchasa andaç ande andersen andi andile andra andrea-marie
andreea andrene andromeda anee anggy anglie aniedi anikie aniu anjul
anmol annu anshu anud anusmiritu anvil anwan anwar aon apple aqi ara
arab arabron arafah araloyin arannya aranya arap arashi arav arci ardell
arfi ariclenes ariyon arkanda armani arnali artt arty aru arucha
arvinder ary aryan asana ashanth ashu assa assi astro atheer athipich
atie attaporn attharut au aufa auli'i ausavaterakul avicii avii aviis
avu-chan avy awat awi awra awwe axle aycan aydan ayize azazel azwile
aïssa b-bomb b.b. b1a4 ba baaj babe babrak bada bade badjie bahle
balinder baljit balkaran ball bam banjo bar baraa baraka barbarao
barclay bass bastille batekoo bayley bayoumi bayray bayyumi baz bb bd
bear beattie beby bee begê behi behroze bel bell bellamine bellamy beo
berkley bessart bettany bevin bharani bhed bi bican bidemi biel bienvenu
bige bigflo bii biichi bim bimby bimen binny bintang blac blackie
blackpink blayne blessing blu blue bnk48 bo-hyun bobb'e bobcat bohang
bolo bomma bommu bong bongile booboo boori boots boulet bouli bowie boy
boyz braedyn brave brays bre-z brec breffini brely brendasykes briga
brighton britain broda brodje bront bronte brook brynie bsaku bshara
btob bts bubbles bucci buhle bukunmi bumper bumpy bunny burn burr buta
butch butsarin byeol c.s. caesar cailan cam'ron cammy campbell caneil
captain cardi carman carmi carroll cary-hiroyuki castille casting cavi
cec cee celestial chacha chachchaya chae-yeong chairun chal chalet chali
challen chan-bi chan-hee chan-sang chanchal chanintorn channon
chansakorn chansangavej charly charmy charnmanoon charudatta chasty
chatra chay chayanan cheang cheewatan cheh chelan chelo chems chenda
cheta cheuk chia-chia chia-ying chicago chicha chieh-kai chien
chien-lien chigul chimwemwe chinaradi chindavanich ching-he ching-kuan
chingo chinmai chio chiqui chiu chonlakarn chonnikan chopper chou
christien chua chuan-chen chucho chui chumphorn chutki chuxiao cibi citi
clarke claus cle clé cm cocoa cohen coleman collins coney copter
corentin corny coty countess creed cress cricket criola crowd cruz cut
cylk cymbal d'arcy d.g. d.l. da'vine dada daddi dado dady dain dally
dalí damaine damandeep dandy dariusz day de de'adre de'aundre deane dedi
deedar deejay denden denholm deni dennie denver der derry desalene
desirae despina destina deto deuntem devery devrim devyn dewanda deyan
deyemi dhanu diamond diankou digo dijon dilan diljott dilshad dilşad
dimi dimples dindi ding-lin dira dito divji divyadarshini dizzy do-yeon
dodo dody doh dohee dominiquie donene dor doudou doval'e doyok dre drop
drue du dub duchess dudu duffy dulé duma dusty dutchess dwi dyllan
dyllon e. earthquake ebiye echo edy edén eeshwar egi ego ehlo einat
eisaya ejke eka ekene ekin eku elan elit elite elko ellery elvy ely emcy
emem ememobong emery emjay emmanuil empoy endhita ene enhe eniola ennio
enno enon enshon enspirit enuka enyima eondeok epy erly erode erom erto
es escalante ese eser essined este estevez etinosa eun-ah eun-bin
eun-hyung eun-ji eun-kyung eun-mi eun-seo eun-soo eun-sook evany ever
everest exid exo eye fa fab fafá fair fakkah fame fana fang faraday
farrand fary fat fele fico figaro figs fily fimie finesse finley firmine
fish fizz flame focus foed fola folake folusho font fortune four fox
fozzie frant freedom freeway french fuju fulu fung fungai funky g.e.m.
g.j. g.v. gaamon gacha galley gamaharitz gambit gamelihle gana gandhi
gang gara garcia gard gardner gardo garfield gates gauravv gaurish gavie
gay ge gen genesis getmore ghana ghorour gi gi-du gick gift gig gillray
gilly gingle giullian giuseppe goga goh gohar golden goldy golf gonzo
goo gook-hwan gornpop got7 gracen gratitude gray groupz gu guan gucci
guggu gul guna gurjit gustine guz gwang gyeon gys h. h.d. h.g. ha-neul
ha-seong hache-p hadar hae-jin hae-seong hae-soo hak halder hale halston
ham hampton hanadi handan hannya haoling hapi harby harlem harpreet
harsharan harshpreet hawn hazar hearty hedy hee-jeong hee-jin hee-seon
henley hepi hero hey! hibiku hidaayath hihi hiiro hill him hinata
ho-jeong hoai hoang hobby hoi hoi-shan holland holliday holmes holt hon
honduras hong-fa hong-seon hongchen horan hoze hozumi hsin huan hyper
hyun-min hyun-sung hümeyra i.m. ia ibukun ice ifa ifu iggy igi iis ijlal
ik iko illikkett imanothai imari ime imke immaduddin inaam inderjit
infinite ingi ingkarat ippsie irán is'haq isa isaki isariya ishaya ishi
ismi isy ivory izu izuka j.a. j.b. j.e. j.f. j.k. j.m. j.p. j.w. ja
ja'siah jac jackrin jacque jae-yee jae-yoon jae-yun jafra jag jaivi
jaloo jam jammeh jamorn jamy jann jarlin jas jashan jashanjeet jasmeet
jason-shane jaspal jaspinder jass jassa jassi jaswinder jatla jaye jayq
jayvee jaz jd jearnest jemmy jenner jensen jeong-hee jeong-shin jerah
jes jesese ji-min ji-woong jiayu jiemeng jin-hong jin-soo jin-sung
jinmai jip jm joavany joman jonnie joo-hyun joo-young jordu josey joss
jourdy jovial jr. jt juani juda junah junchen jung-ah jung-an just
justice k k'ang-i k.d. k.g. k.j. k.k. k.n. k.p.a.c. kachapa kachi kafin
kagiso kai-xuan kaki kalama kama kamber kan kan-hie kanata kanaya kaneta
kanin kannada kansai kanta kanto kanwal kanwaljeet kanwaljit kanyi kao
kaolip kar karamjit karran kashish kasi kat-tun katlego katleho katt
kawa kaz kc kee keerati kel kelechi kelen kendo kennedy keo keppy
kerrigan kery ketche ketchup kether ketprapakorn kett kevyn keyakizaka46
khathu khaya khosi khushdeed ki ki-hyeon kida kief kien kiernan kiff kil
killer kimhak kimti kin-yan kiowa kirati kis-my-ft2 kisum kiti kitu kiño
klarke kochu kodi koii kom_i kompheak kong kongtoranin kongyingyong koo
koobeshan kookie kool kopi koya krijay kudzai kulada kulappulli
kuljinder kumarakom kumud kunjue kuntz kura kuwaarjeet kvr kych
kyeong-rim kyeong-yeong kyme kyo kyzza kéfera l l.j. lachion lady lain
lake lalu lama lang lanuakam lassy leather ledicia leem leemore
leeratanakajorn leez lehar leighton lemogang lennon leone lerkcharoempoj
lestonja leïti lier lights lilliput lima linden liniker little ll llum
lobo logic loi london long lord loretto los lota loti loulou lovell
lowrey lp luangsodsai ludi lui lukram lun lunathi lurie lushin luv luxia
luís lv lyriq lény lô m m.c. m.k. m.l. m.r. m.s. machiko machine maestro
mag magi magic magá mahal mahayotaruk mahin mahiro maine mais mak
makgano malay mama mamat mamley mammukoya man-wai mandra mangala manie
manjinder manjot manmeet mann mano manpneet mansore manthana manussa mao
maoni marama marca mare marhoom markie maru masam masane masi masoom
massy mather mati mau mausam maxi mayar mayday mayko mayo maysara maître
mcfly mcg medalion medi mega meher mem meray meren merin merit method
mez mhd mhel micha miel mijo mikelle mikha mild mime min-ji min-jin
min-jung mingjie mini mink minne mirhan mischa misel mish mishu mithra
mithraboomi mitsuki mitsuko mittal mix mišel mj mo'nique mofe moga moji
moka moksha molawa mon monday monet moni monière monkey monserrat
monsieur mook mora morla moro moryfère motlatsi moto motoko mountain
mousam mr ms. msabeh mugi muh muhadkly munachi muppets musetta mutsuki
myko m・a・o n.d. naa nagah nakai naomie napaphat napat nara narikun
narucha nasim nasty nattanun nattapat navaniat navinder navjot
nawapaiboon nayampally naz na’kom necro neena-sinaii neenasam negra
neimus nessbeal nesta new news ngo nien nihal niken nikis nilbi nimo
nine ninja nish nishat nizhalgal nkem nobi noble nobu nominath non
nontanun nontapan noom nor note notlim nottapon nse ntonga ntosh
nuntasai nunthapak nusret nutt nylon nyungsang o o'shea o. o.j. o.t.
oakley oasis oat octavia odley oil oja oka okawa olisa ollie oludara
olunike olwenya ombo omi omono on on-on ong onuryay onyeka orange oreka
organ ori oris orny osas osi oskar oswin osy otig ouchi oxcel oz ozama
p.t. pa. pai paik pakey pakoda pala paladesh pallas pally pamu pang
panta paoli paprika paramjit paran pardeep parmeet parminder parris pass
patch patcha pathy pattarasaya paw paween payidar peace peanut pearle
peijia pell pemy pepi peto pets pham phan phi phichikorn phua phuong
picky pidi piercey pii pik pilot pink pip pisay pitta piu plerng pnl
point pok pom pooch poom poorna prabhjyot prayaga president presley prim
prime princey prit pua puff puma punkie pushy putu qianyuan qing qinyi
qiuyan qlf quei quek quera r.g. r.h. r.l. r.r. r.v. raayo radhu raffa
ragi rag’n’bone rai rainky rajni rako raleigh ramblin' rameet rano rao
raphaelle raphaëlle rapsody rarecho rath rathaa rattanapond ratthanant
ravidev ravikanth ravil ravin ravinder ravish ravishankar rayen raymie
raz razane reagan rebel red reeth refal reiley reilly reine reiya rel
remilekun remon remus reo resham rezca ricci rif rihanna rii riki rikki
riko rimal rinke rinku riri riythvika rk roe roji romaine romann romany
rong roni rooney ropie rorrie rotem royal ruobing ruoyun rushita
rushmore ryoo rémy s'thandiwe s.a. s.j. s.m. s.n. s.v. sab sabal sad
sadi saga sage saii sainty sakha sakhi sakuljaroensuk sala samadhi
sambasa samin samm samr san sanga santana santinatornkul santiwithi
sarabjit sarain saran sarang sargun sarit sasi sasin sassy sato satsumi
satti savage saw scali schemci schuyler scorcher scotia scout se-ha
se-jin se-yoon secret secun segilola sei seiran sendy seong ser'darius
seraph seu seven severn sha shaffy shah shai shalin shalom sham shandy
shanley shanoor shar sharry sharwani shawne shek shengyi sheridan shiga
shih shijia shine shinee shinei shion shiviske shola shone shono shoq
shotty showkar shri shujoon shunori shunya shuya shy sibabalwe sihle
simja simple simranjit simrat sin singh siphosethu sippy sir sirikiet
sistar sister siu siu-ho siu-hung siu-see sivan sixtones skei ski slaine
slick smile smiley smriti snow sohag sohai sohn sok soki solo somer somy
sornam soso soungdok soxy spark sqikin sr steef steen sticky stink
subaru suboi sugar sukha sukhjinder sunao supapunpinyo supasawad
suteerush sutton suty suun suwaphat suzuki swanky swann sze szu t'nia
t-bone t.c. t.d. t.i. t.p. t.r. t.v. tack taim tak takemi taki tanikella
tanny tanta tantimedh tasuku tata tau tavi tayam taye taz teach teeshay
teiyu teja temarii tendai tendaiishe teng tengku tensai tenz texas thai
thamela thana thanapatpisal thati the thich this thiti thitinan thitirat
thongkanthom thu thuy ti tianyu ticoy tien-chi tiet tig tight tiki
tikriti tiku tiler tiller time tinge tinker tinnu tiny tio tiriel titi
titikarn tiwari tk to-hoi tobie togo toka toke toki tokio toko toks
tokunbo tomi tommi tommie-amber tomori tone tone-loc tono tonto tonton
tonye tooni topp tora tosan tota toto toyosi trapa tremaine tress trieu
trin trinidad tristen troi tsao tseng tsholofelo tsui tu tuc tuck tumi
tunbosun tunku tvv tyas tzu-chiang tzu-chuan táta uche ufoma ufuoma umie
upi uru uzee v.k. v.m. vaidya val vanilla vauxhall vayu vector vengo
very via vice viet view viji virast vitta viv vivi vixx viña vj vk
vlastra voke vu waco wah wallie wan-kyung wandy wanny waraphat
waratthaya wash wasu wati wavyy weird wen-chu wen-lin wenn wesam whip
white whyn willeke win wing winky wiwattanawarang wiz won wood woon x
xan xand xiaoxing xing xinyi xiu xolile xuan y. ya yandy yare yarrow
yasa yat yaya yayu yc yeh yeom yichi yijuan yise yoakyake yoku yomi yon
yonda yongxi yook yoon-sik young-ju younuts! youyi yu-xuan yuming yung
yura yuuki yuwu z. zabyn zahn zandy zax zeel zen zhensu zhongyu zhuang
ziggy zihlo ziyah zizi zo zohar zonghan zulu zune
""".split()
